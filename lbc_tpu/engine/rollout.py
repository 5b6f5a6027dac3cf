"""Fused closed-loop rollouts: agent + world in one lax.scan.

This is the structure that turns the reference's ~10 env-steps/sec
client/server hot loop (SURVEY.md section 3.1) into >= 1e5 batched
steps/sec: agent policy, controller, dynamics, actors, trackers and
observations execute as one jitted program per tick, vmapped over the env
batch, with done-masking instead of per-env control flow.

Cross-chip scaling (SURVEY.md section 2.2 env-parallelism row): pass a
`jax.sharding.Mesh` and the whole scan runs under `shard_map` with the
env batch split over the 'data' axis. Environments are independent, so
no collectives are needed inside the loop — each chip steps its own
shard of the world; XLA only gathers at the host boundary. The same path
shards the fused Pallas BEV kernel (each shard invokes it on its local
batch).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class RolloutMetrics(NamedTuple):
    done: jnp.ndarray        # (B,) bool
    success: jnp.ndarray     # (B,) bool
    collided: jnp.ndarray    # (B,) bool
    ticks: jnp.ndarray       # (B,) int32 ticks consumed until done/cutoff
    ran_lights: jnp.ndarray  # (B,) int32


def make_rollout(env, agent_step: Callable, n_steps: int,
                 collect: Callable = None, batched_agent: bool = False,
                 mesh=None):
    """Build rollout(env_states, agent_states) -> (final env/agent states,
    metrics, collected).

    With `mesh`, the rollout runs under shard_map with the env batch
    sharded over the mesh's 'data' axis (batch size must divide evenly);
    results are bit-identical to the single-device path
    (tests/test_parallel.py).

    agent_step(map_data, env_state, obs, agent_state)
        -> (control (3,), agent_state, aux); with `batched_agent` the
    agent receives/returns full (B, ...) batches instead of being vmapped
    per env (lets it call batched kernels like the Pallas BEV render and
    run the conv net at the full batch size).
    collect(env_state, obs, control, aux) -> pytree recorded per step
    (stacked along time at axis 0); None disables trajectory recording.
    With `batched_agent`, a collect carrying `collect.batched = True`
    receives full (B, ...) batches instead of being vmapped — lets it
    call batched kernels (e.g. the fused Pallas camera render).
    """
    map_data = env.map_data

    if not batched_agent:
        def one_env_step(env_state, agent_state):
            obs = env.observe(env_state)
            control, new_agent_state, aux = agent_step(
                map_data, env_state, obs, agent_state)
            new_env_state, new_obs = env.step(env_state, control)
            done = env_state.episode.done  # scalar cond broadcasts
            frozen = jax.tree.map(
                lambda new, old: jnp.where(done, old, new),
                new_env_state, env_state)
            agent_out = jax.tree.map(
                lambda new, old: jnp.where(done, old, new),
                new_agent_state, agent_state)
            rec = None
            if collect is not None:
                rec = collect(env_state, obs, control, aux)
            return frozen, agent_out, rec

        batched = jax.vmap(one_env_step)
    else:
        observe_b = jax.vmap(env.observe)
        step_b = jax.vmap(env.step)
        if collect is None:
            collect_b = None
        elif getattr(collect, 'batched', False):
            collect_b = collect
        else:
            collect_b = jax.vmap(collect)

        def batched(env_states, agent_states):
            obs = observe_b(env_states)
            control, new_agent_states, aux = agent_step(
                map_data, env_states, obs, agent_states)
            new_env_states, _ = step_b(env_states, control)
            done = env_states.episode.done          # (B,)

            def sel(new, old):
                d = done.reshape(done.shape + (1,) * (new.ndim - 1))
                return jnp.where(d, old, new)

            frozen = jax.tree.map(sel, new_env_states, env_states)
            agent_out = jax.tree.map(sel, new_agent_states, agent_states)
            rec = None
            if collect_b is not None:
                rec = collect_b(env_states, obs, control, aux)
            return frozen, agent_out, rec

    def body(carry, _):
        env_states, agent_states = carry
        env_states, agent_states, rec = batched(env_states, agent_states)
        return (env_states, agent_states), rec

    def rollout_core(env_states, agent_states):
        (env_states, agent_states), recs = jax.lax.scan(
            body, (env_states, agent_states), None, length=n_steps)
        ep = env_states.episode
        metrics = RolloutMetrics(
            done=ep.done, success=ep.success, collided=ep.collided,
            ticks=ep.tick, ran_lights=ep.total_lights_ran)
        return env_states, agent_states, metrics, recs

    if mesh is None:
        # NOTE: no donate_argnums — bench.py (best-of-3) and the
        # parallel-consistency tests re-invoke with the same inputs, and
        # the scan carry already reuses buffers internally; donation
        # would only save the one-time initial copy
        return jax.jit(rollout_core)

    from jax.sharding import PartitionSpec as P
    try:                                    # jax >= 0.4.35
        from jax import shard_map
        kw = {'check_vma': False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        kw = {'check_rep': False}
    data = P('data')
    # recs are stacked along time at axis 0 -> batch is axis 1
    sharded = shard_map(
        rollout_core, mesh=mesh,
        in_specs=(data, data),
        out_specs=(data, data, data, P(None, 'data')),
        **kw)
    return jax.jit(sharded)
