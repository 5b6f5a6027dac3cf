"""Analytic collision and lane-invasion tests.

Replaces the CARLA collision / lane-invasion sensors
(carla_utils.py:680-724): oriented-bounding-box overlap via the separating
axis theorem for vehicle-vehicle, expanded-OBB point tests for walkers, and
raster lookups for static world / lane markings.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..constants import (EGO_EXTENT_X, EGO_EXTENT_Y, PIXELS_PER_METER,
                         WALKER_EXTENT)


def obb_corners(pos, yaw, ex, ey):
    """(..., 2), (...,) -> (..., 4, 2) corner points."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    fwd = jnp.stack([c, s], axis=-1)
    right = jnp.stack([-s, c], axis=-1)
    ex = jnp.asarray(ex)[..., None]
    ey = jnp.asarray(ey)[..., None]
    p = pos[..., None, :]
    signs = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], jnp.float32)
    return p + signs[..., 0:1] * (fwd * ex)[..., None, :] \
             + signs[..., 1:2] * (right * ey)[..., None, :]


def _project_interval(corners, axis):
    proj = jnp.sum(corners * axis[..., None, :], axis=-1)
    return jnp.min(proj, axis=-1), jnp.max(proj, axis=-1)


def obb_overlap(pos_a, yaw_a, ex_a, ey_a, pos_b, yaw_b, ex_b, ey_b):
    """SAT overlap test; broadcasts over leading dims. Returns bool."""
    ca = obb_corners(pos_a, yaw_a, ex_a, ey_a)
    cb = obb_corners(pos_b, yaw_b, ex_b, ey_b)
    sep = jnp.zeros(jnp.broadcast_shapes(yaw_a.shape, yaw_b.shape), bool)
    for yaw in (yaw_a, yaw_b):
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        for axis in (jnp.stack([c, s], -1), jnp.stack([-s, c], -1)):
            amin, amax = _project_interval(ca, axis)
            bmin, bmax = _project_interval(cb, axis)
            sep = sep | (amax < bmin) | (bmax < amin)
    return ~sep


# The reference collision sensor only latches when the impulse exceeds
# 400 N*s (carla_utils.py:702-714) — a pedestrian brushing a stopped car
# never registers. The analytic analog gates overlaps on relative motion.
MIN_VEHICLE_IMPACT_SPEED = 1.0   # m/s combined ego+other speed
# ~70 kg walker: impulse ~ 2*m*v needs v ≈ 400/(2*70) ≈ 2.9 m/s to reach
# the 400 N*s threshold; 1.7 m/s is a conservative cut that still counts
# genuine run-overs while ignoring pull-away brushes the reference's
# sensor also ignores
MIN_WALKER_IMPACT_SPEED = 1.7    # m/s ego speed
MIN_STATIC_IMPACT_SPEED = 0.25


def ego_vehicle_collision(ego_pos, ego_yaw, veh_pos, veh_yaw, veh_active,
                          ego_speed=None, veh_speed=None,
                          veh_ex=EGO_EXTENT_X, veh_ey=EGO_EXTENT_Y):
    hit = obb_overlap(ego_pos, ego_yaw, EGO_EXTENT_X, EGO_EXTENT_Y,
                      veh_pos, veh_yaw, veh_ex, veh_ey)
    if ego_speed is not None:
        impact = (ego_speed + veh_speed) > MIN_VEHICLE_IMPACT_SPEED
        hit = hit & impact
    return jnp.any(hit & veh_active)


def ego_walker_collision(ego_pos, ego_yaw, walker_pos, walker_active,
                         ego_speed=None):
    """Walker centers tested against the ego OBB expanded by the walker
    half-extent (circle-vs-box approximated by box-vs-point)."""
    rel = walker_pos - ego_pos
    c, s = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    along = rel[..., 0] * c + rel[..., 1] * s
    lateral = -rel[..., 0] * s + rel[..., 1] * c
    inside = (jnp.abs(along) < EGO_EXTENT_X + WALKER_EXTENT) \
        & (jnp.abs(lateral) < EGO_EXTENT_Y + WALKER_EXTENT)
    any_hit = jnp.any(inside & walker_active)
    if ego_speed is not None:
        any_hit = any_hit & (ego_speed > MIN_WALKER_IMPACT_SPEED)
    return any_hit


def _sample_raster(raster, world_offset, points):
    px = jnp.round((points - world_offset) * PIXELS_PER_METER)
    h, w = raster.shape
    cx = jnp.clip(px[..., 0].astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(px[..., 1].astype(jnp.int32), 0, h - 1)
    return raster[cy, cx]


def ego_static_collision(ego_pos, ego_yaw, walkable_raster, world_offset,
                         ego_speed=None):
    """Hit a building/fence: any ego corner outside the walkable band
    (road + sidewalks). CARLA's collision sensor fires on static props;
    the walkable band plays the role of free space."""
    corners = obb_corners(ego_pos, ego_yaw, EGO_EXTENT_X, EGO_EXTENT_Y)
    vals = _sample_raster(walkable_raster, world_offset, corners)
    hit = jnp.any(vals == 0)
    if ego_speed is not None:
        hit = hit & (ego_speed > MIN_STATIC_IMPACT_SPEED)
    return hit


def ego_lane_invasion(ego_pos, ego_yaw, lane_raster, world_offset):
    """Lane-invasion sensor approximation: an ego corner touches a lane
    marking pixel (carla_utils.py:691-724)."""
    corners = obb_corners(ego_pos, ego_yaw, EGO_EXTENT_X, EGO_EXTENT_Y)
    vals = _sample_raster(lane_raster, world_offset, corners)
    return jnp.any(vals > 0)
