"""Pedestrians: goal-walking state machines on the sidewalk band.

Replaces CARLA's navmesh walker AI (carla_utils.py:424-476, controller.ai.
walker) including the reference's stuck-detector + teleport rule
(PedestrianTracker, carla_utils.py:176-225): walkers head straight to a
sampled target on the walkable band (which includes road crossings — the
reference uses a modified navmesh so pedestrians cross roads, README.md:
105-114), pick a new target on arrival, and teleport to a spawn-table
point >= 10 m from the hero when stuck for 20 ticks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import DT, PIXELS_PER_METER
from .state import WalkerState

STUCK_LIMIT = 20          # ticks below speed threshold before teleport
SPEED_THRESHOLD = 0.1     # m/s
TARGET_REACH = 1.0        # m
TARGET_RADIUS = 25.0      # m: new goals sampled within this range


def _sample_targets(key, cur_pos, walker_spawn):
    """Pick the *nearest* of 8 random spawn-table candidates. Nearby
    sidewalk points are usually on the walker's own side of the road, so
    most walkers patrol their sidewalk and only some cross — matching the
    reference's occasionally-crossing navmesh crowds (README.md:105-114)
    instead of everyone jaywalking."""
    n = walker_spawn.shape[0]
    k1, k2 = jax.random.split(key)
    cand_idx = jax.random.randint(k1, (cur_pos.shape[0], 8), 0, n)
    cand = walker_spawn[cand_idx]                    # (P, 8, 2)
    d = jnp.linalg.norm(cand - cur_pos[:, None, :], axis=-1)
    # too-close candidates would make walkers dither in place
    d = jnp.where(d < 4.0, jnp.inf, d)
    nearest = jnp.argmin(d, axis=1)
    pick = jnp.take_along_axis(cand, nearest[:, None, None].repeat(2, -1),
                               axis=1)[:, 0]
    return pick, k2


def walker_step(walkers: WalkerState, map_data, ego_pos, key,
                vehicle_pos=None, vehicle_active=None,
                vehicle_speed=None, ego_speed=None) -> WalkerState:
    """One tick for all walkers of one env."""
    pos, target = walkers.pos, walkers.target

    to_tgt = target - pos
    dist = jnp.linalg.norm(to_tgt, axis=-1)
    yaw = jnp.arctan2(to_tgt[:, 1], to_tgt[:, 0])
    step = jnp.minimum(walkers.speed * DT, dist)
    dirn = to_tgt / jnp.maximum(dist, 1e-6)[:, None]
    new_pos = pos + dirn * step[:, None]

    # keep walkers on the walkable band: freeze the move if it would exit
    px = jnp.round((new_pos - map_data.world_offset) * PIXELS_PER_METER)
    h, w = map_data.walkable_raster.shape
    cx = jnp.clip(px[:, 0].astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(px[:, 1].astype(jnp.int32), 0, h - 1)
    ok = map_data.walkable_raster[cy, cx] > 0
    new_pos = jnp.where(ok[:, None], new_pos, pos)

    # navmesh-agent-like yield: a walker stops 3 m short of a *moving*
    # vehicle and keeps 1.8 m personal space from stopped ones (close
    # enough to finish most crossings — a residual mutual freeze resolves
    # via the stuck-teleport rule below, mirroring the reference's
    # PedestrianTracker escape hatch).
    if vehicle_pos is not None:
        vp = jnp.concatenate([vehicle_pos, ego_pos[None]], axis=0)
        va = jnp.concatenate([vehicle_active, jnp.ones((1,), bool)])
        if vehicle_speed is not None:
            vs = jnp.concatenate([vehicle_speed, ego_speed[None]])
            moving = vs > 0.5
        else:
            moving = jnp.ones_like(va)
        radius = jnp.where(moving, 3.0, 1.8)
        d2 = jnp.sum((new_pos[:, None, :] - vp[None, :, :]) ** 2, axis=-1)
        blocked = jnp.any((d2 < radius[None, :] ** 2) & va[None, :],
                          axis=1)
        new_pos = jnp.where(blocked[:, None], pos, new_pos)

    moved = jnp.linalg.norm(new_pos - pos, axis=-1) / DT
    stuck_ticks = jnp.where(moved < SPEED_THRESHOLD,
                            walkers.stuck_ticks + 1, 0)

    # new target on arrival
    arrived = dist < TARGET_REACH
    new_target, key = _sample_targets(key, new_pos, map_data.walker_spawn)
    target = jnp.where(arrived[:, None], new_target, target)

    # stuck -> teleport to a spawn point >= 10 m from the hero and the old
    # location (PedestrianTracker rule)
    stuck = stuck_ticks >= STUCK_LIMIT
    k1, key = jax.random.split(key)
    tp_idx = jax.random.randint(k1, (pos.shape[0], 8), 0,
                                map_data.walker_spawn.shape[0])
    tp_cand = map_data.walker_spawn[tp_idx]
    far_from_ego = jnp.linalg.norm(tp_cand - ego_pos, axis=-1) >= 10.0
    far_from_old = jnp.linalg.norm(tp_cand - new_pos[:, None, :],
                                   axis=-1) >= 10.0
    good = far_from_ego & far_from_old
    first = jnp.argmax(good, axis=1)
    tp = jnp.take_along_axis(tp_cand, first[:, None, None].repeat(2, -1),
                             axis=1)[:, 0]
    new_pos = jnp.where(stuck[:, None], tp, new_pos)
    target = jnp.where(stuck[:, None], new_target, target)
    stuck_ticks = jnp.where(stuck, 0, stuck_ticks)

    active = walkers.active
    new_pos = jnp.where(active[:, None], new_pos, pos)
    return WalkerState(pos=new_pos, yaw=yaw, speed=walkers.speed,
                       target=target, stuck_ticks=stuck_ticks,
                       active=active)
