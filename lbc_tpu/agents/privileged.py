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


def make_privileged_agent_batched(model: BirdviewPolicy, variables,
                                  compute_dtype=None):
    """Batched-agent variant for make_rollout(batched_agent=True): the BEV
    render runs through the fused Pallas kernel and the conv net sees the
    full env batch at once (the fast path used by bench.py).

    `compute_dtype=jnp.bfloat16` runs the conv net in bf16 (params cast
    once here, activations per step); waypoints return to f32 before the
    controller, whose PID state stays f32."""
    import jax

    from ..engine.lights import light_states_md
    from ..ops import render_bev_crop_pallas

    if compute_dtype is not None:
        # cast params only; BatchNorm batch_stats stay f32 — normalizing
        # with bf16 running statistics adds avoidable error on top of the
        # bf16 activations (flax BN upcasts stats consistently)
        variables = dict(variables)
        variables['params'] = jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            variables['params'])

    def step(map_data, env_states, obs, agent_states):
        lstate = jax.vmap(lambda t0, t: light_states_md(
            map_data, t0, t))(
                env_states.episode.light_t0, env_states.episode.tick)
        # render only the 192x192 agent crop (bit-identical to
        # crop_birdview(full_render, dx) — tests/test_pallas_bev.py)
        crop = render_bev_crop_pallas(
            map_data, env_states.ego.pos, env_states.ego.yaw,
            env_states.npc.pos, env_states.npc.yaw, env_states.npc.active,
            env_states.walkers.pos, env_states.walkers.active, lstate,
            dx=AGENT_CROP_DX)
        speed = obs['speed']
        command = obs['command']
        if compute_dtype is not None:
            crop = crop.astype(compute_dtype)
            locations = model.apply(
                variables, crop, speed.astype(compute_dtype),
                one_hot_command(command).astype(compute_dtype))
            locations = locations.astype(jnp.float32)
        else:
            locations = model.apply(variables, crop, speed,
                                    one_hot_command(command))
        control, ctrl = birdview_agent_control(
            locations, speed, command, agent_states.controller)
        return control, PrivilegedAgentState(ctrl), locations

    return step
