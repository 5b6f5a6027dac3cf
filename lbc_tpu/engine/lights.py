"""Traffic-light state machines as pure functions of episode time.

The reference reads server-side light actors (carla_utils.py:296-323,
map_utils.py:786-854 — per-light green/yellow durations live on the CARLA
light actor). Here each junction runs a fixed-cycle controller: its lights
take turns being green for its junction's green duration then yellow while
the others hold red. Durations are per-junction map tables
(maps/map_data.py junction_green_s/junction_yellow_s; CARLA-0.9.6 default
10 s / 3 s). Because the cycle is deterministic given a per-junction clock
offset, light state needs *no* mutable storage — it is a function of
(t0, episode time), which keeps the jitted step stateless and cheap.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import DT

GREEN_S = 10.0
YELLOW_S = 3.0
PHASE_S = GREEN_S + YELLOW_S

GREEN, YELLOW, RED = 0, 1, 2


def light_states(light_junction, light_phase, junction_n_phases,
                 light_t0, tick, green_s=None, yellow_s=None):
    """States of all lights at `tick` (single env; vmap outside).

    light_junction: (L,) junction id per light; light_phase: (L,) slot in
    its junction's rotation; junction_n_phases: (J,); light_t0: (J,) clock
    offsets randomized per episode; green_s/yellow_s: (J,) per-junction
    durations (None = uniform CARLA defaults). Returns (L,) int32 in
    {GREEN, YELLOW, RED}.
    """
    t = tick.astype(jnp.float32) * DT
    nph = jnp.maximum(junction_n_phases[light_junction], 1)
    g = GREEN_S if green_s is None else green_s[light_junction]
    y = YELLOW_S if yellow_s is None else yellow_s[light_junction]
    phase = g + y
    cycle = nph.astype(jnp.float32) * phase
    c = jnp.mod(light_t0[light_junction] + t, cycle)
    k = jnp.floor(c / phase).astype(jnp.int32)
    r = c - k.astype(jnp.float32) * phase
    mine = light_phase == k
    state = jnp.where(mine, jnp.where(r < g, GREEN, YELLOW), RED)
    return state.astype(jnp.int32)


def light_states_md(map_data, light_t0, tick):
    """light_states with the per-junction timing tables from map_data."""
    return light_states(map_data.light_junction, map_data.light_phase,
                        map_data.junction_n_phases, light_t0, tick,
                        map_data.junction_green_s,
                        map_data.junction_yellow_s)
