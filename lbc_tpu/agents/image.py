"""Image (student) agent: RGB camera -> net -> unproject -> controller.

Capability parity with ImageAgent (/root/reference/bird_view/models/
image.py:93-219): the 384x160 RGB frame is rendered by lbc_tpu.render.
camera, the network predicts 5 waypoints in image space, the decode
unprojects them through the pinhole ground-plane model and runs the
circle-fit/PID controller with the image-agent gain set.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..control import ControllerState, controller_init, image_agent_control
from ..models import ImagePolicy, one_hot_command
from ..render.camera import render_camera_state


class ImageAgentState(NamedTuple):
    controller: ControllerState


def image_agent_init(batch_shape=()) -> ImageAgentState:
    return ImageAgentState(controller_init(batch_shape))


def make_image_agent(model: ImagePolicy, variables):
    """step(map_data, env_state, obs, agent_state) ->
    (control, agent_state, (locations, rgb)). Single env; vmap outside."""

    def step(map_data, env_state, obs, agent_state: ImageAgentState):
        rgb = render_camera_state(map_data, env_state)
        speed = obs['speed']
        command = obs['command']
        cmd_onehot = one_hot_command(command[None])
        locations = model.apply(variables, rgb[None], speed[None],
                                cmd_onehot)[0]
        control, ctrl = image_agent_control(
            locations, speed, command, agent_state.controller)
        return control, ImageAgentState(ctrl), (locations, rgb)

    return step


def make_image_agent_batched(model: ImagePolicy, variables,
                             interpret: bool = False):
    """Batched-agent variant for make_rollout(batched_agent=True): the
    camera render runs through the fused Pallas kernel
    (ops/camera_kernel.py) and the conv net sees the full env batch at
    once — mirrors make_privileged_agent_batched. `interpret` runs the
    kernel in Pallas interpret mode (CPU tests)."""
    from ..ops.camera_kernel import render_camera_state_pallas

    def step(map_data, env_states, obs, agent_states):
        rgb = render_camera_state_pallas(map_data, env_states,
                                         interpret=interpret)
        speed = obs['speed']
        command = obs['command']
        locations = model.apply(variables, rgb, speed,
                                one_hot_command(command))
        control, ctrl = image_agent_control(
            locations, speed, command, agent_states.controller)
        return control, ImageAgentState(ctrl), (locations, rgb)

    return step
