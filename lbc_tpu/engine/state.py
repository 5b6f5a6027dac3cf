"""Batched world state pytrees.

The device-resident replacement for the CARLA server's actor registry
(SURVEY.md section 2.3). Every field is a fixed-shape array; per-env
batching is added by vmap in engine.env. Shapes noted per single env.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class EgoState(NamedTuple):
    pos: jnp.ndarray        # (2,) m
    yaw: jnp.ndarray        # () rad
    speed: jnp.ndarray      # () m/s forward
    prev_vel: jnp.ndarray   # (2,) m/s world-frame, for acceleration obs
    steer: jnp.ndarray      # () last applied control
    throttle: jnp.ndarray   # ()
    brake: jnp.ndarray      # ()


class NPCVehicleState(NamedTuple):
    pos: jnp.ndarray        # (V, 2)
    yaw: jnp.ndarray        # (V,)
    speed: jnp.ndarray      # (V,)
    wp: jnp.ndarray         # (V,) int32 current target lattice waypoint
    active: jnp.ndarray     # (V,) bool


class WalkerState(NamedTuple):
    pos: jnp.ndarray          # (P, 2)
    yaw: jnp.ndarray          # (P,)
    speed: jnp.ndarray        # (P,) commanded walking speed
    target: jnp.ndarray       # (P, 2) current goal
    target_idx: jnp.ndarray   # (P,) int32 goal's walker_spawn table index
    stuck_ticks: jnp.ndarray  # (P,) int32
    anchor: jnp.ndarray       # (P, 2) confinement reference point
    anchor_ticks: jnp.ndarray  # (P,) int32 ticks spent near the anchor
    active: jnp.ndarray       # (P,) bool


class RouteState(NamedTuple):
    pos: jnp.ndarray         # (R, 2) route nodes at 2.5 m
    cmd: jnp.ndarray         # (R,) int32 RoadOption per node
    cumdist: jnp.ndarray     # (R,) cumulative arc length
    length: jnp.ndarray      # () int32 valid prefix length
    next_idx: jnp.ndarray    # () int32 head of the remaining queue
    checkpoint_idx: jnp.ndarray  # () int32 last reached node (-1 = none)
    command: jnp.ndarray     # () int32 current command (checkpoint cmd)


class EpisodeState(NamedTuple):
    tick: jnp.ndarray              # () int32 since ready()
    timestamp_active: jnp.ndarray  # () int32 control steps
    collided: jnp.ndarray          # () bool
    invaded: jnp.ndarray           # () bool
    ran_light: jnp.ndarray         # () bool (this tick)
    total_lights: jnp.ndarray      # () int32
    total_lights_ran: jnp.ndarray  # () int32
    last_light: jnp.ndarray        # () int32 id of last counted light
    timeout: jnp.ndarray           # () f32 frames
    target_pos: jnp.ndarray        # (2,)
    start_pos: jnp.ndarray         # (2,)
    weather: jnp.ndarray           # () int32 preset id 1..14
    light_t0: jnp.ndarray          # (J,) f32 per-junction clock offsets
    rng: jnp.ndarray               # (2,) uint32 PRNG key
    done: jnp.ndarray              # () bool
    success: jnp.ndarray           # () bool
    # ego junction-entry reservation, refreshed each step by env.step
    # (engine.routing.intended_connector); agents read the cached value
    # (1 tick stale) instead of re-deriving it from the route
    res_j: jnp.ndarray             # () int32 junction id, -1 = none
    res_cmask: jnp.ndarray         # () uint32 reserved connector bitmask
    res_d: jnp.ndarray             # () f32 distance to the entry
    # hot-loop dedup caches, refreshed each step by env.step: the ego's
    # nearest lattice waypoint at the CURRENT pos and the per-junction
    # connector occupancy of the CURRENT npc waypoint bank — agents read
    # these instead of re-gathering (bit-exact: env.step writes them from
    # the same arrays the agent would read next tick)
    ego_wp: jnp.ndarray            # () int32
    occ_bits: jnp.ndarray          # (J,) uint32


class EnvState(NamedTuple):
    ego: EgoState
    npc: NPCVehicleState
    walkers: WalkerState
    route: RouteState
    episode: EpisodeState
