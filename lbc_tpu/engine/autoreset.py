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

    Returns (state, obs, bank_ptr, rng). The replacement entry's RNG is
    refreshed so repeated visits to a bank slot diverge.
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
    return out, obs, bank_ptr, rng
