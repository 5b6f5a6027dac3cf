"""Pedestrians: goal-walking state machines on the sidewalk band.

Replaces CARLA's navmesh walker AI (carla_utils.py:424-476, controller.ai.
walker) including the reference's stuck-detector + teleport rule
(PedestrianTracker, carla_utils.py:176-225). Walkers stroll their own
sidewalk piece (same connected component = no road crossing) and only
occasionally pick a goal across the street — mirroring the reference's
navmesh crowds, which mostly keep to sidewalks but do cross roads thanks
to the authors' navmesh fix (README.md:105-114). Stuck walkers teleport
to a spawn-table point >= 10 m from the hero after 20 slow ticks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import DT, PIXELS_PER_METER
from .state import WalkerState

STUCK_LIMIT = 20          # ticks below speed threshold before teleport
SPEED_THRESHOLD = 0.1     # m/s
# confinement escape hatch: a walker boxed in between queued vehicles
# paces tiny circles in the pocket — always "moving", so the speed-based
# stuck rule never fires — while sitting in every queued car's walker
# hazard cone, freezing the queue forever (dense-suite audit, round 4:
# Town01 s106-t193 junction 11). A walker that stays within
# CONFINED_RADIUS of its anchor for CONFINED_TICKS while standing ON the
# road teleports out exactly like a stuck one.
CONFINED_RADIUS = 3.0     # m
CONFINED_TICKS = 150      # 15 s
TARGET_REACH = 1.0        # m
TARGET_RADIUS = 25.0      # m: new goals sampled within this range
CROSS_PROB = 0.12         # chance a new goal may be across the road


def _next_goal(key, target_idx, map_data, cross_prob=CROSS_PROB):
    """New goal index via the precomputed neighbor tables: a same-sidewalk
    stroll (walker_neighbors) or, with `cross_prob`, a deliberate road
    crossing (walker_cross_neighbors). O(1) gathers, guaranteed local."""
    p = target_idx.shape[0]
    k1, k2, k3, k_out = jax.random.split(key, 4)
    stroll_col = jax.random.randint(k1, (p,), 0,
                                    map_data.walker_neighbors.shape[1])
    cross_col = jax.random.randint(
        k2, (p,), 0, map_data.walker_cross_neighbors.shape[1])
    stroll = map_data.walker_neighbors[target_idx, stroll_col]
    cross = map_data.walker_cross_neighbors[target_idx, cross_col]
    do_cross = jax.random.uniform(k3, (p,)) < cross_prob
    idx = jnp.where(do_cross, cross, stroll)
    return idx, map_data.walker_spawn[idx], k_out


def walker_step(walkers: WalkerState, map_data, ego_pos, key,
                vehicle_pos=None, vehicle_active=None,
                vehicle_speed=None, ego_speed=None,
                vehicle_yaw=None, ego_yaw=None,
                respawn_peds: bool = True) -> WalkerState:
    """One tick for all walkers of one env. `respawn_peds` (static)
    enables the stuck-teleport rule (PedestrianTracker,
    carla_utils.py:176-225); FullTown01-v0 collection disables it."""
    pos, target = walkers.pos, walkers.target

    to_tgt = target - pos
    dist = jnp.linalg.norm(to_tgt, axis=-1)
    yaw = jnp.arctan2(to_tgt[:, 1], to_tgt[:, 0])
    step = jnp.minimum(walkers.speed * DT, dist)
    dirn = to_tgt / jnp.maximum(dist, 1e-6)[:, None]

    # candidate headings: straight at the target, then sidesteps
    # (navmesh-crowd local avoidance — CARLA walkers steer around
    # obstacles rather than stopping dead; a walker that freezes in a
    # car's path deadlocks against the expert's speed-scaled hazard
    # cone, see the yield note below). First clear candidate wins;
    # if none, stay put (stuck-teleport below is the escape hatch).
    angles = jnp.array([0.0, 0.7854, -0.7854, 1.5708, -1.5708])
    cosa, sina = jnp.cos(angles), jnp.sin(angles)
    # rotate dirn by each angle: (P, K, 2)
    cand_dir = jnp.stack(
        [dirn[:, None, 0] * cosa[None, :] - dirn[:, None, 1] * sina[None, :],
         dirn[:, None, 0] * sina[None, :] + dirn[:, None, 1] * cosa[None, :]],
        axis=-1)
    cand_pos = pos[:, None, :] + cand_dir * step[:, None, None]

    # gate 1 — walkable band: reject candidates that exit it.
    # step < 0.2 m = < 1 px at 5 px/m, so every candidate pixel sits in
    # the 3x3 neighborhood of the current pixel: ONE uint32 gather from
    # the packed nav raster (maps/map_data.py:_pack_nav_raster) answers
    # the walkable gate here plus the road-entry/on-road tests below —
    # the per-candidate (P, K) raster gathers it replaces were the
    # round-3 throughput regression (random HBM gathers, batch-scaled).
    h, w = map_data.walkable_raster.shape
    cur_px = jnp.round((pos - map_data.world_offset) * PIXELS_PER_METER)
    cx0 = jnp.clip(cur_px[:, 0].astype(jnp.int32), 0, w - 1)
    cy0 = jnp.clip(cur_px[:, 1].astype(jnp.int32), 0, h - 1)
    nav = map_data.nav_raster[cy0, cx0]                 # (P,) uint32
    px = jnp.round((cand_pos - map_data.world_offset) * PIXELS_PER_METER)
    cx = jnp.clip(px[..., 0].astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(px[..., 1].astype(jnp.int32), 0, h - 1)
    dxy = jnp.clip(cx - cx0[:, None], -1, 1), jnp.clip(cy - cy0[:, None],
                                                       -1, 1)
    bit = ((dxy[1] + 1) * 3 + (dxy[0] + 1)).astype(jnp.uint32)  # (P, K)
    ok = ((nav[:, None] >> bit) & 1) > 0                # (P, K) walkable

    # navmesh-agent-like yield: a walker stops 3 m short of a vehicle
    # moving at real driving speed — and only when it is actually in that
    # vehicle's forward path (60-degree half-cone). Two deadlock modes
    # found by the round-3 NoCrashTown02-v3 audit make this deliberately
    # narrow: (a) a circular yield froze walkers BESIDE slowly-turning
    # cars, parking them just outside the expert's reference-faithful
    # hazard cone (agent.py:184-200) where the car's swept path then
    # clipped them; (b) yielding to a *creeping* car (ego pulling away
    # from a hazard stop at <1.5 m/s) froze the walker in the car's path
    # exactly while the expert's speed-scaled hazard cone was too short
    # to see it — mutual freeze ending in a sweep collision. CARLA
    # walkers don't yield to walking-pace traffic; at those speeds the
    # walker clears the area faster by walking on. Stopped vehicles keep
    # a 1.8 m personal-space circle (can't walk through a parked car);
    # residual mutual freezes resolve via the stuck-teleport rule below
    # (PedestrianTracker escape hatch).
    if vehicle_pos is not None:
        vp = jnp.concatenate([vehicle_pos, ego_pos[None]], axis=0)
        va = jnp.concatenate([vehicle_active, jnp.ones((1,), bool)])
        if vehicle_speed is not None:
            vs = jnp.concatenate([vehicle_speed, ego_speed[None]])
            moving = vs > 1.5
        else:
            moving = jnp.ones((va.shape[0],), bool)
        if vehicle_yaw is not None:
            vy = jnp.concatenate([vehicle_yaw, ego_yaw[None]])
            fwd = jnp.stack([jnp.cos(vy), jnp.sin(vy)], axis=-1)
        else:
            fwd = None
        rel = cand_pos[:, :, None, :] - vp[None, None, :, :]  # (P, K, V, 2)
        d2 = jnp.sum(rel ** 2, axis=-1)
        # body clearance: candidate inside the vehicle's OBB inflated by
        # the walker radius + margin is blocked for EVERY vehicle, moving
        # or not. (A 1.8 m center-circle missed the bbox corners — the
        # body half-diagonal is 2.55 m — so walkers could legally stand
        # inside a stopped car's footprint-to-be and get swept when it
        # pulled away: the round-3 Town01 s162-t139 audit.)
        if fwd is not None:
            from ..constants import EGO_EXTENT_X, EGO_EXTENT_Y
            lat = jnp.stack([-fwd[:, 1], fwd[:, 0]], axis=-1)
            fx = jnp.sum(rel * fwd[None, None, :, :], axis=-1)
            fy = jnp.sum(rel * lat[None, None, :, :], axis=-1)
            # walker radius + safety; moving vehicles get a swept-path
            # allowance — a car pulling away while steering swings its
            # rear corner ~0.8 m outside the static box, clipping a
            # walker parked at the old margin (round-4 Town02 s64-t1
            # second audit), so walkers step clear of anything rolling
            margin = jnp.where(vs > 0.3, 1.5, 0.7)[None, None, :] \
                if vehicle_speed is not None else 0.7
            inside = (jnp.abs(fx) < EGO_EXTENT_X + margin) \
                & (jnp.abs(fy) < EGO_EXTENT_Y + margin)
            # moving vehicles also block their forward path (3 m, 60 deg)
            along = fx
            in_path = (d2 < 3.0 ** 2) \
                & (along > 0.5 * jnp.sqrt(jnp.maximum(d2, 1e-9)))
            blocked_v = inside | (moving[None, None, :] & in_path)
        else:
            blocked_v = jnp.where(moving[None, None, :], d2 < 3.0 ** 2,
                                  d2 < 1.8 ** 2)
        cand_blocked = jnp.any(blocked_v & va[None, None, :], axis=-1)

        # road-entry caution: don't STEP ONTO the road surface while fast
        # traffic is within 6 m — the second round-3 collision mode was a
        # walker strolling off the curb into the rear corner of a passing
        # car (outside every hazard cone; nothing in the expert can brake
        # for it). Walkers already on the road (mid-crossing) are not
        # gated — they clear the lane fastest by continuing. Road bits
        # come from the same packed-nav gather as gate 1 (bit 9+b;
        # center cell b=4).
        cand_on_road = ((nav[:, None] >> (bit + jnp.uint32(9))) & 1) > 0
        already_on_road = ((nav >> jnp.uint32(13)) & 1) > 0
        # entry is gated on any ROLLING vehicle (>0.3 m/s), not just
        # driving-speed ones: a hazard-released ego creeping off a stop
        # (<1.5 m/s) must not have a walker step back into its path one
        # car-length ahead (round-4 Town02 s64-t1 audit: walker left the
        # road, the expert's cone cleared, both re-entered and met)
        if vehicle_speed is not None:
            rolling = vs > 0.3
        else:
            rolling = moving
        traffic_near = jnp.any((d2 < 6.0 ** 2) & rolling[None, None, :]
                               & va[None, None, :], axis=-1)
        entering_danger = cand_on_road & traffic_near \
            & ~already_on_road[:, None]
        ok = ok & ~cand_blocked & ~entering_danger

    # first clear candidate in priority order; all-blocked -> stay put
    any_ok = jnp.any(ok, axis=1)
    best = jnp.argmax(ok, axis=1)
    chosen = jnp.take_along_axis(cand_pos, best[:, None, None],
                                 axis=1)[:, 0]
    new_pos = jnp.where(any_ok[:, None], chosen, pos)

    moved = jnp.linalg.norm(new_pos - pos, axis=-1) / DT
    stuck_ticks = jnp.where(moved < SPEED_THRESHOLD,
                            walkers.stuck_ticks + 1, 0)

    # confinement detector (see CONFINED_* above): on-road walkers that
    # orbit a small pocket without net progress count as stuck. The
    # on-road test reuses the packed-nav gather (bit 9 + center cell 4).
    on_road_now = ((nav >> jnp.uint32(13)) & 1) > 0
    drift = jnp.linalg.norm(new_pos - walkers.anchor, axis=-1)
    escaped = drift > CONFINED_RADIUS
    anchor = jnp.where(escaped[:, None], new_pos, walkers.anchor)
    anchor_ticks = jnp.where(escaped, 0, walkers.anchor_ticks + 1)
    confined = (anchor_ticks >= CONFINED_TICKS) & on_road_now

    # new target on arrival (same sidewalk piece, occasional crossing)
    arrived = dist < TARGET_REACH
    goal_idx, goal_pos, key = _next_goal(key, walkers.target_idx,
                                         map_data)
    target = jnp.where(arrived[:, None], goal_pos, target)
    target_idx = jnp.where(arrived, goal_idx, walkers.target_idx)

    # stuck -> teleport to a spawn point >= 10 m from the hero and the old
    # location (PedestrianTracker rule)
    stuck = ((stuck_ticks >= STUCK_LIMIT) | confined) & bool(respawn_peds)
    k1, key = jax.random.split(key)
    tp_idx = jax.random.randint(k1, (pos.shape[0], 8), 0,
                                map_data.walker_spawn.shape[0])
    tp_cand = map_data.walker_spawn[tp_idx]
    far_from_ego = jnp.linalg.norm(tp_cand - ego_pos, axis=-1) >= 10.0
    far_from_old = jnp.linalg.norm(tp_cand - new_pos[:, None, :],
                                   axis=-1) >= 10.0
    good = far_from_ego & far_from_old
    first = jnp.argmax(good, axis=1)
    tp_sel = jnp.take_along_axis(tp_idx, first[:, None], axis=1)[:, 0]
    tp = map_data.walker_spawn[tp_sel]
    new_pos = jnp.where(stuck[:, None], tp, new_pos)
    target = jnp.where(stuck[:, None], tp, target)   # re-goal next arrival
    target_idx = jnp.where(stuck, tp_sel, target_idx)
    stuck_ticks = jnp.where(stuck, 0, stuck_ticks)
    anchor = jnp.where(stuck[:, None], tp, anchor)
    anchor_ticks = jnp.where(stuck, 0, anchor_ticks)

    active = walkers.active
    new_pos = jnp.where(active[:, None], new_pos, pos)
    return WalkerState(pos=new_pos, yaw=yaw, speed=walkers.speed,
                       target=target, target_idx=target_idx,
                       stuck_ticks=stuck_ticks, anchor=anchor,
                       anchor_ticks=anchor_ticks, active=active)
