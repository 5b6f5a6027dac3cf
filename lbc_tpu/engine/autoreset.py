"""Auto-reset: continuous batched rollouts from a bank of reset states.

The reference restarts episodes by rebuilding the CARLA world
(carla_utils.py:489-522). Here finished envs swap in a fresh pre-planned
reset state from a device-resident bank — no host round trip, so
training/serving loops run indefinitely inside one scan (the pattern that
sustains the 1e5 steps/sec headline on long horizons).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .env import DrivingEnv, stack_states
from .state import EnvState


def build_reset_bank(env: DrivingEnv, tasks, seed: int = 0) -> EnvState:
    """tasks: list of (start, target, weather). Returns a stacked bank."""
    states = [env.reset_np(seed=seed + i, start=s, target=t, weather=w)
              for i, (s, t, w) in enumerate(tasks)]
    return stack_states(states)


def autoreset_step(env: DrivingEnv, state: EnvState, control, bank,
                   bank_ptr, rng):
    """Single-env step with bank-swap on done (vmap outside over envs;
    `bank` is shared, `bank_ptr` is per-env).

    Returns (state, obs, bank_ptr, rng, done) — `done` flags the tick on
    which an episode finished (and was swapped out), so callers can count
    completed episodes / reset controller state. The replacement entry's
    RNG is refreshed so repeated visits to a bank slot diverge.
    """
    new_state, obs = env.step(state, control)
    done = new_state.episode.done

    n_bank = bank.episode.tick.shape[0]
    rng, k = jax.random.split(rng)
    nxt = (bank_ptr + 1 + jax.random.randint(k, (), 0, n_bank - 1)) \
        % n_bank
    fresh = jax.tree.map(lambda x: x[nxt], bank)
    rng, k2 = jax.random.split(rng)
    fresh = fresh._replace(episode=fresh.episode._replace(rng=k2))

    out = jax.tree.map(lambda f, s: jnp.where(done, f, s), fresh,
                       new_state)
    bank_ptr = jnp.where(done, nxt, bank_ptr)
    return out, obs, bank_ptr, rng, done


def make_autoreset_rollout(env: DrivingEnv, agent_step: Callable,
                           n_steps: int, bank: EnvState, agent_reset,
                           batched_agent: bool = False, mesh=None):
    """Continuous closed-loop rollout: finished envs swap in a fresh task
    from the device-resident bank instead of freezing — the long-horizon
    serving pattern that sustains peak steps/sec indefinitely
    (bench.py --autoreset). Controller state resets to `agent_reset`
    (single-env template) at episode boundaries.

    Returns rollout(env_states, agent_states, bank_ptrs, rngs) ->
    (env_states, agent_states, bank_ptrs, rngs, episodes_done (B,)).
    With `mesh`, runs under shard_map with the batch over 'data'
    (the bank is replicated)."""
    map_data = env.map_data

    if not batched_agent:
        def one_env(env_state, agent_state, ptr, rng, fin):
            obs = env.observe(env_state)
            control, new_agent, _aux = agent_step(map_data, env_state,
                                                  obs, agent_state)
            out, _obs2, ptr, rng, done = autoreset_step(
                env, env_state, control, bank, ptr, rng)
            new_agent = jax.tree.map(
                lambda init, cur: jnp.where(done, init, cur),
                agent_reset, new_agent)
            return out, new_agent, ptr, rng, fin + done.astype(jnp.int32)

        batched = jax.vmap(one_env)
    else:
        observe_b = jax.vmap(env.observe)
        swap_b = jax.vmap(
            lambda s, c, p, r: autoreset_step(env, s, c, bank, p, r))

        def batched(env_states, agent_states, ptrs, rngs, fin):
            obs = observe_b(env_states)
            control, new_agents, _aux = agent_step(
                map_data, env_states, obs, agent_states)
            out, _o, ptrs, rngs, done = swap_b(env_states, control, ptrs,
                                               rngs)

            def sel(init, cur):
                d = done.reshape(done.shape + (1,) * (cur.ndim - 1))
                return jnp.where(d, init, cur)   # init broadcasts over B

            new_agents = jax.tree.map(sel, agent_reset, new_agents)
            return out, new_agents, ptrs, rngs, \
                fin + done.astype(jnp.int32)

    def body(carry, _):
        return batched(*carry), None

    def rollout_core(env_states, agent_states, ptrs, rngs):
        fin = jnp.zeros_like(ptrs)
        carry, _ = jax.lax.scan(
            body, (env_states, agent_states, ptrs, rngs, fin), None,
            length=n_steps)
        return carry

    if mesh is None:
        return jax.jit(rollout_core)

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
        kw = {'check_vma': False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        kw = {'check_rep': False}
    data = P('data')
    sharded = shard_map(rollout_core, mesh=mesh,
                        in_specs=(data, data, data, data),
                        out_specs=(data, data, data, data, data), **kw)
    return jax.jit(sharded)
