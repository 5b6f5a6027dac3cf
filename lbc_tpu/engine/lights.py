"""Traffic-light state machines as pure functions of episode time.

The reference reads server-side light actors (carla_utils.py:296-323,
map_utils.py:786-854). Here each T-junction runs a fixed-cycle controller:
its lights take turns being green for GREEN_S then yellow for YELLOW_S
while the others hold red (CARLA 0.9.6-like timing). Because the cycle is
deterministic given a per-junction clock offset, light state needs *no*
mutable storage — it is a function of (t0, episode time), which keeps the
jitted step stateless and cheap.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import DT

GREEN_S = 10.0
YELLOW_S = 3.0
PHASE_S = GREEN_S + YELLOW_S

GREEN, YELLOW, RED = 0, 1, 2


def light_states(light_junction, light_phase, junction_n_phases,
                 light_t0, tick):
    """States of all lights at `tick` (single env; vmap outside).

    light_junction: (L,) junction id per light; light_phase: (L,) slot in
    its junction's rotation; junction_n_phases: (J,); light_t0: (J,) clock
    offsets randomized per episode. Returns (L,) int32 in {GREEN, YELLOW,
    RED}.
    """
    t = tick.astype(jnp.float32) * DT
    nph = jnp.maximum(junction_n_phases[light_junction], 1)
    cycle = nph.astype(jnp.float32) * PHASE_S
    c = jnp.mod(light_t0[light_junction] + t, cycle)
    k = jnp.floor(c / PHASE_S).astype(jnp.int32)
    r = c - k.astype(jnp.float32) * PHASE_S
    mine = light_phase == k
    state = jnp.where(mine, jnp.where(r < GREEN_S, GREEN, YELLOW), RED)
    return state.astype(jnp.int32)
