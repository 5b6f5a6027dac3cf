"""CIL baseline agent: direct control regression.

Capability parity with BaselineAgent (/root/reference/bird_view/models/
baseline.py:93-122) including its 20-frame full-throttle launch hack for
getting the car rolling from standstill.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..models import BaselineCIL, one_hot_command
from ..render.camera import render_camera_state

LAUNCH_FRAMES = 20
LAUNCH_SPEED = 0.5     # m/s below which the launch hack may trigger


class BaselineAgentState(NamedTuple):
    launch_count: jnp.ndarray   # () int32 frames of forced launch left


def baseline_agent_init() -> BaselineAgentState:
    return BaselineAgentState(jnp.asarray(0, jnp.int32))


def make_baseline_agent(model: BaselineCIL, variables):
    def step(map_data, env_state, obs, agent_state: BaselineAgentState):
        rgb = render_camera_state(map_data, env_state)
        speed = obs['speed']
        cmd_onehot = one_hot_command(obs['command'][None])
        control, _pred_speed = model.apply(variables, rgb[None],
                                           speed[None], cmd_onehot)
        steer = jnp.clip(control[0, 0], -1.0, 1.0)
        throttle = jnp.clip(control[0, 1], 0.0, 1.0)
        brake = jnp.clip(control[0, 2], 0.0, 1.0)

        # launch hack: stuck at standstill with no brake -> floor it for
        # LAUNCH_FRAMES (baseline.py:104-117)
        stuck = (speed < LAUNCH_SPEED) & (brake < 0.5) \
            & (agent_state.launch_count == 0)
        count = jnp.where(stuck, LAUNCH_FRAMES, agent_state.launch_count)
        launching = count > 0
        throttle = jnp.where(launching, 1.0, throttle)
        brake = jnp.where(launching, 0.0, brake)
        count = jnp.maximum(count - 1, 0)

        out = jnp.stack([steer, throttle, brake])
        return out, BaselineAgentState(count), out

    return step
