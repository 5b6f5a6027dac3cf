"""Driving agents (reference: bird_view/models/ agents + roaming)."""
from .autopilot import ExpertState, expert_init, expert_step
from .image import ImageAgentState, image_agent_init, make_image_agent
from .privileged import (PrivilegedAgentState, make_privileged_agent,
                         privileged_init)

__all__ = ['ExpertState', 'expert_init', 'expert_step',
           'ImageAgentState', 'image_agent_init', 'make_image_agent',
           'PrivilegedAgentState', 'make_privileged_agent',
           'privileged_init']
