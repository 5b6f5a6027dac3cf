"""Driving agents (reference: bird_view/models/ agents + roaming)."""
from .autopilot import ExpertState, expert_init, expert_step
from .privileged import (PrivilegedAgentState, make_privileged_agent,
                         privileged_init)

__all__ = ['ExpertState', 'expert_init', 'expert_step',
           'PrivilegedAgentState', 'make_privileged_agent',
           'privileged_init']
