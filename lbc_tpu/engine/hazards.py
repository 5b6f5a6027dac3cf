"""Hazard predicates (vectorized re-statements of the reference's expert
safety checks in PythonAPI/agents/navigation/agent.py:95-251 and
agents/tools/misc.py:62-86). Used by both the autopilot expert and NPC
vehicles. All functions are single-env; vmap outside.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import PIXELS_PER_METER, PROXIMITY_THRESHOLD
from .lights import RED


def within_distance_ahead(target_pos, cur_pos, yaw, max_distance, degree):
    """is_within_distance_ahead (misc.py:62-86), batched over targets.

    target_pos: (..., 2); cur_pos: (2,); yaw: () rad. Returns (...,) bool.
    """
    u = target_pos - cur_pos
    d = jnp.linalg.norm(u, axis=-1)
    fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)], axis=-1)
    cosang = jnp.sum(u * fwd, axis=-1) / jnp.maximum(d, 1e-6)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    return (d <= max_distance) & (ang < degree) & (d > 1e-6)


def yaw_difference_deg(yaw_a, yaw_b):
    """compute_yaw_difference (misc.py:45-59): absolute angle between
    headings in degrees, in [0, 180]."""
    d = jnp.abs(jnp.mod(yaw_a - yaw_b + jnp.pi, 2 * jnp.pi) - jnp.pi)
    return jnp.degrees(d)


def vehicle_hazard(pos, yaw, veh_pos, veh_yaw, veh_active,
                   proximity=PROXIMITY_THRESHOLD, in_junction=False):
    """_is_vehicle_hazard (agent.py:202-251): blocked by any active vehicle
    with |yaw diff| <= 150 deg within `proximity` m inside a 45 deg cone.

    Two additions over the reference predicate (round-3 collision audit,
    Town02 88->33 / 64->1, deterministic across weathers):
    * a narrow dead-ahead corridor for ONCOMING traffic (> 150 deg, which
      the reference gate ignores): our Bezier junction connectors swing
      turning vehicles closer to the opposing lane than CARLA's lane
      geometry does. 6 m x +-1.8 m catches true head-on blockers while
      still ignoring the adjacent oncoming lane (5 m lateral offset).
    * `in_junction=True` drops the heading gate entirely: inside a
      junction every vehicle in the cone is a genuine path conflict (the
      150-deg gate exists for the adjacent oncoming LANE, a road-only
      concept); the expert was corner-clipping crossing traffic it was
      heading-gate-blind to while swinging through turns.
    """
    same_dir = yaw_difference_deg(yaw, veh_yaw) <= 150.0
    same_dir = jnp.logical_or(same_dir, in_junction)
    ahead = within_distance_ahead(veh_pos, pos, yaw, proximity, 45.0)
    rel = veh_pos - pos
    fx = rel[..., 0] * jnp.cos(yaw) + rel[..., 1] * jnp.sin(yaw)
    lat = -rel[..., 0] * jnp.sin(yaw) + rel[..., 1] * jnp.cos(yaw)
    headon = (fx > 0.0) & (fx < 6.0) & (jnp.abs(lat) < 1.8)
    return jnp.any(((same_dir & ahead) | headon) & veh_active)


def red_light_hazard(pos, yaw, light_state, light_stop_pos, light_stop_yaw,
                     stop_distance=PROXIMITY_THRESHOLD):
    """_is_light_red_europe_style (agent.py:95-131): a red light on our lane
    ahead of us. Same-lane is tested geometrically against the governed
    approach: within `stop_distance` m *before* the stop line, laterally
    inside the lane, heading aligned within 60 deg."""
    rel = pos - light_stop_pos                       # (L, 2)
    cos = jnp.cos(light_stop_yaw)
    sin = jnp.sin(light_stop_yaw)
    along = rel[..., 0] * cos + rel[..., 1] * sin    # + = past stop line
    lateral = -rel[..., 0] * sin + rel[..., 1] * cos
    heading_ok = yaw_difference_deg(yaw, light_stop_yaw) < 60.0
    in_zone = (along > -stop_distance) & (along < 0.5) \
        & (jnp.abs(lateral) < 2.6)
    return jnp.any(in_zone & heading_ok & (light_state == RED))


def _on_road_ring(walker_pos, nav_raster, world_offset):
    """Curb-flicker-tolerant on-road test: reads the packed nav raster's
    3x3 road neighborhood (bits 9..17, maps/map_data.py:_pack_nav_raster)
    instead of the single road pixel. A walker hovering ON the curb line
    flickers a one-pixel test on and off; the ring adds ~0.2 m of
    tolerance — far less than the 3.5 m sidewalk band, so sidewalk
    strollers still never read as on-road."""
    px = jnp.round((walker_pos - world_offset) * PIXELS_PER_METER)
    h, w = nav_raster.shape
    cx = jnp.clip(px[..., 0].astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(px[..., 1].astype(jnp.int32), 0, h - 1)
    return (nav_raster[cy, cx] & jnp.uint32(0x3FE00)) > 0


# pull-away clearance: ego half-diagonal (2.45 x 1.0 OBB ~ 2.65 m) minus
# the bit of corner a walker can't reach; swept-path audits put the
# strike radius at <= 2.0 m from the ego center (round-4 Town02 s66-t45)
LAUNCH_CLEAR = 2.6


def walker_hazard(pos, yaw, walker_pos, walker_active, nav_raster,
                  world_offset, proximity=PROXIMITY_THRESHOLD):
    """_is_walker_hazard (agent.py:184-200): distance-scaled cone, walkers
    on the sidewalk ignored (see _on_road_ring for the curb-flicker
    tolerance; the round-4 Town02 s64-t1 audit showed the expert pulling
    away in a one-pixel off frame and striking the walker as it stepped
    back in)."""
    d = jnp.linalg.norm(walker_pos - pos, axis=-1)
    degree = 162.0 / (jnp.clip(d, 1.5, 10.5) + 0.3)
    on_road = _on_road_ring(walker_pos, nav_raster, world_offset)
    ahead = within_distance_ahead(walker_pos, pos, yaw, proximity, degree)
    return jnp.any(ahead & on_road & walker_active)


def walker_launch_block(pos, speed, walker_pos, walker_active, nav_raster,
                        world_offset, radius=LAUNCH_CLEAR):
    """Standing-start gate: never pull away while an on-road walker is
    within `radius` of the ego CENTER, at any bearing.

    The forward hazard cone can't see a pedestrian standing beside the
    car, but a launch from standstill swings the body through a wide arc:
    the round-4 Town02 s66-t45 dense audit showed the expert stopped
    mid-junction-turn, a curb-flickering walker oscillating 1.7 m off its
    left flank (outside the cone), and the full-steer pull-away sweeping
    the flank into the walker. Only applies at standstill (< 0.5 m/s) so
    cruising past close sidewalk traffic is unaffected, and the on-road
    ring test keeps stopped-at-light queues from being pinned by sidewalk
    strollers. If the walker never leaves, the confinement teleport
    (engine/walkers.py CONFINED_*) clears it within 15 s."""
    d = jnp.linalg.norm(walker_pos - pos, axis=-1)
    on_road = _on_road_ring(walker_pos, nav_raster, world_offset)
    near = jnp.any((d < radius) & on_road & walker_active)
    return (speed < 0.5) & near
