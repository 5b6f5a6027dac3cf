"""Privileged ("cheating") agent: BEV net + waypoint controller, fused.

Capability parity with BirdViewAgent
(/root/reference/bird_view/models/birdview.py:82-174): crop the 320x320
BEV with dx=-10, run the privileged network, decode waypoints through the
circle-fit/PID controller. The whole pipeline (render -> crop -> conv net
-> controller) lives inside the jitted rollout.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import AGENT_CROP_DX
from ..control import (ControllerState, birdview_agent_control,
                       controller_init)
from ..models import BirdviewPolicy, crop_birdview, one_hot_command
from ..render.bev import render_bev_state


class PrivilegedAgentState(NamedTuple):
    controller: ControllerState


def privileged_init(batch_shape=()) -> PrivilegedAgentState:
    return PrivilegedAgentState(controller_init(batch_shape))


def make_privileged_agent(model: BirdviewPolicy, variables):
    """Returns step(map_data, env_state, obs, agent_state) ->
    (control, agent_state, locations). Single env; vmap outside — the conv
    net batches over envs via the vmapped call."""

    def step(map_data, env_state, obs, agent_state: PrivilegedAgentState):
        bev = render_bev_state(map_data, env_state)
        crop = crop_birdview(bev, dx=AGENT_CROP_DX)
        speed = obs['speed']
        command = obs['command']
        cmd_onehot = one_hot_command(command[None])
        locations = model.apply(variables, crop[None], speed[None],
                                cmd_onehot)[0]
        control, ctrl = birdview_agent_control(
            locations, speed, command, agent_state.controller)
        return control, PrivilegedAgentState(ctrl), locations

    return step
