"""NPC traffic vehicles: vectorized lattice-following autopilot.

Replaces CARLA's server-side vehicle autopilot (carla_utils.py:394-422)
with the same behavioral contract the reference's expert encodes
(roaming.py:32-100): follow the lane, slow in turns, emergency-stop for
leading vehicles, red lights, and crossing walkers. All NPCs in an env are
advanced with one fused vector step — no per-actor control flow.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import (DT, EXPERT_TARGET_SPEED, EXPERT_TURN_SPEED_FACTOR)
from .dynamics import DEFAULT_DYNAMICS, bicycle_step
from .hazards import (red_light_hazard, walker_hazard, within_distance_ahead,
                      yaw_difference_deg)
from .routing import nearest_waypoint
from .state import NPCVehicleState

NPC_REACH = 2.0        # m: advance to the next lattice waypoint
NPC_STEER_KP = 1.2
NPC_THROTTLE_KP = 0.8
# NPCs queue tighter and pull away harder than the reference's expert
# predicate (9.5 m cone) — dense-suite junction throughput depends on it.
# 7.5 m centers = ~2.8 m bumper gap (bboxes are 4.7 m long), enough to
# brake from queue-creep speeds. Used for the red-light / walker stop
# distances; vehicle following uses the speed-dependent gap below.
NPC_PROXIMITY = 7.5
# speed-dependent car-following gap (center-to-center): base + headway*v.
# A fixed cone can't do both jobs — 7.5 m keeps queues sparse and slow to
# drain (NoCrash v5/v6 timeouts), 6.0 m rear-ends stopped queues from
# full speed (tools/sweep_traffic.py: 3-4/6 ego collisions). At standstill
# vehicles pack to ~1.3 m bumper gap; at 5.1 m/s cruise the gap is 8.6 m,
# beyond the ~2 m braking distance.
NPC_GAP_BASE = 6.0     # m center-to-center at standstill
NPC_GAP_HEADWAY = 0.5  # s of extra gap per m/s of own speed
# stopped cross traffic inside a junction blocks inside this radius;
# must exceed the 4.7 m nose-to-tail contact distance
NPC_IMMINENT = 5.8
# junction-entry gate (anti-gridlock, "don't block the box"): hold at the
# junction boundary while a CONFLICTING movement occupies the box (cross
# or merge per maps/map_data.py:_connector_tables) or the box is at
# vehicle capacity. CARLA's traffic manager sequences junction entry
# server-side; this is the table-driven analog. Gating on conflicting
# *connectors* (instead of round-3's any-stopped-vehicle-inside rule)
# both prevents the mid-junction nose-to-nose deadlocks that collapsed
# the dense NoCrash suites (a left turn entered against the oncoming
# straight that shares its green under opposing-phase lights, then both
# held each other forever) and lets non-conflicting movements flow
# concurrently.
NPC_JUNCTION_CAP = 4
NPC_ENTRY_HOLD = 4.5   # m from the last road waypoint to start holding
# the ego reserves its planned connector this far ahead of the entry (so
# NPCs yield to an approaching ego exactly like to one already inside)
EGO_RESERVE_DIST = 12.0
# the expert holds for conflicting junction traffic this far before the
# entry (stops from 6 m/s with ~2 m margin at the fitted brake curve)
EGO_ENTRY_HOLD = 9.0


def _hash01(a, b, c):
    """Counter-based uniform in [0,1): deterministic per (seed, npc, wp)."""
    x = (a * jnp.uint32(2654435761) + b * jnp.uint32(40503)
         + c * jnp.uint32(69069) + jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    return (x & jnp.uint32(0xFFFFFF)).astype(jnp.float32) / float(1 << 24)


def junction_occupancy(map_data, veh_wp, veh_active, extras=()):
    """Per-junction connector occupancy from target waypoints.

    Returns (occ_bits (J,) uint32 — bit k set iff connector k of the
    junction has a committed vehicle — and occ_total (J,) int32).
    `extras`: (junction, conn_bitmask) scalar pairs for occupants not in
    the waypoint bank — the ego's snapped connector and its route-based
    reservation (engine.routing.intended_connector).
    """
    wpj = map_data.wp_junction
    wpc = map_data.wp_conn
    n_j = map_data.junction_n_phases.shape[0]
    n_k = map_data.junction_conflict.shape[1]
    cur_j = wpj[veh_wp]
    cur_c = jnp.maximum(wpc[veh_wp], 0)
    inside = (cur_j >= 0) & veh_active
    occ_cnt = jnp.zeros((n_j, n_k), jnp.int32).at[
        jnp.where(inside, cur_j, n_j), cur_c].add(1, mode='drop')
    kbits = jnp.arange(n_k, dtype=jnp.uint32)
    occ_bits = jnp.sum(
        jnp.where(occ_cnt > 0, jnp.uint32(1) << kbits[None, :],
                  jnp.uint32(0)), axis=1, dtype=jnp.uint32)
    occ_total = jnp.sum(occ_cnt, axis=1)
    for ex_j, ex_mask in extras:
        jj = jnp.maximum(ex_j, 0)
        present = ex_j >= 0
        occ_bits = occ_bits.at[jj].set(
            jnp.where(present, occ_bits[jj] | ex_mask.astype(jnp.uint32),
                      occ_bits[jj]))
        occ_total = occ_total.at[jj].add(present.astype(jnp.int32))
    return occ_bits, occ_total


def npc_vehicle_step(npc: NPCVehicleState, map_data, ego_pos, ego_yaw,
                     walker_pos, walker_active, light_state, seed,
                     dynamics=DEFAULT_DYNAMICS,
                     ego_res_j=None, ego_res_c=None,
                     ego_wp=None, with_aux=False):
    """One tick for all NPC vehicles of one env (vmap over envs outside).

    ego_res_j/ego_res_c: the ego's junction connector reservation
    (scalars: junction id or -1, connector BITMASK), from
    engine.routing.intended_connector — an approaching or inside ego
    holds conflicting NPC entries exactly like a committed NPC would.
    ego_wp: the ego's nearest lattice waypoint if the caller already
    gathered it (env.step does); None re-derives it here.
    with_aux=True additionally returns {'held_only_by_ego': (N,) bool} —
    NPCs stopped inside a junction whose ONLY hazard is the ego itself.
    The expert's junction-entry hold must not wait for these (env.step
    drops them from the cached occupancy): the NPC waits for the ego and
    the ego would wait for the NPC, a cycle neither can leave
    (ADVICE r4: ego<->NPC mutual junction hold).
    """
    wp_pos = map_data.wp_pos
    wp_next = map_data.wp_next
    wp_n_next = map_data.wp_n_next
    wp_is_junction = map_data.wp_is_junction

    pos, yaw, speed, wp = npc.pos, npc.yaw, npc.speed, npc.wp

    wpj = map_data.wp_junction
    wpc = map_data.wp_conn
    stopped_npc = speed < 0.3
    # the ego occupies BOTH its snapped connector while inside a junction
    # (a stopped learned agent inside must hold conflicting entries
    # exactly like a stopped NPC) AND its route reservation — near a
    # crossing the snap can flicker onto the other connector, so either
    # alone under-reports the ego's true footprint
    if ego_wp is None:
        ego_wp = nearest_waypoint(map_data.grid_idx, map_data.world_offset,
                                  ego_pos)
    ego_j = wpj[ego_wp]
    ego_mask = jnp.uint32(1) << jnp.maximum(
        wpc[ego_wp], 0).astype(jnp.uint32)
    if ego_res_j is None:
        ego_res_j = jnp.asarray(-1, jnp.int32)
        ego_res_c = jnp.asarray(0, jnp.uint32)
    extras = ((ego_j, ego_mask),
              (ego_res_j, ego_res_c.astype(jnp.uint32)))

    # --- waypoint advance (up to 2 per tick; lattice spacing 1 m) ---
    n_npc = wp.shape[0]
    idxs = jnp.arange(n_npc)
    entry_hold = jnp.zeros(n_npc, bool)
    for _ in range(2):
        # recompute occupancy each sub-advance so an entry admitted in the
        # first pass is visible to gates in the second
        occ_bits, occ_total = junction_occupancy(
            map_data, wp, npc.active, extras)
        d = jnp.linalg.norm(wp_pos[wp] - pos, axis=-1)
        u = _hash01(seed.astype(jnp.uint32), jnp.arange(wp.shape[0],
                    dtype=jnp.uint32), wp.astype(jnp.uint32))
        n_next = jnp.maximum(wp_n_next[wp], 1)
        pick = jnp.minimum((u * n_next.astype(jnp.float32)).astype(jnp.int32),
                           n_next - 1)
        nxt = jnp.take_along_axis(wp_next[wp], pick[:, None], axis=1)[:, 0]
        nxt = jnp.where(nxt < 0, wp, nxt)
        # hold at the boundary while a conflicting movement occupies the
        # junction (or it is at capacity); the gate clears when it exits
        entering = (wpj[wp] < 0) & (wpj[nxt] >= 0)
        jn = jnp.maximum(wpj[nxt], 0)
        kn = jnp.maximum(wpc[nxt], 0)
        conf = map_data.junction_conflict[jn, kn]          # (N,) uint32
        blocked = entering & (((occ_bits[jn] & conf) != 0)
                              | (occ_total[jn] >= NPC_JUNCTION_CAP))
        # same-tick arbitration: two NPCs admitted together on conflicting
        # connectors would recreate the mid-box meet — lower index enters,
        # the other waits one tick and re-tests against the new occupancy
        cand = entering & ~blocked & (d < NPC_REACH) & npc.active
        pair_conf = (((conf[:, None] >> kn[None, :].astype(jnp.uint32))
                      & 1) > 0) & (jn[:, None] == jn[None, :])
        peer = cand[:, None] & cand[None, :] & pair_conf \
            & (idxs[None, :] < idxs[:, None])
        blocked = blocked | jnp.any(peer, axis=1)
        wp = jnp.where((d < NPC_REACH) & ~blocked, nxt, wp)
        entry_hold = entry_hold | (blocked & (d < NPC_ENTRY_HOLD))

    # --- steering: proportional heading error to the target waypoint ---
    to_tgt = wp_pos[wp] - pos
    desired = jnp.arctan2(to_tgt[:, 1], to_tgt[:, 0])
    err = jnp.mod(desired - yaw + jnp.pi, 2 * jnp.pi) - jnp.pi
    steer = jnp.clip(NPC_STEER_KP * err, -1.0, 1.0)

    # --- target speed ---
    in_junction = wp_is_junction[wp]
    target_speed = jnp.where(
        in_junction, EXPERT_TARGET_SPEED * EXPERT_TURN_SPEED_FACTOR,
        EXPERT_TARGET_SPEED) * 0.85   # NPCs drive slightly under the expert

    # --- hazards (vectorized over NPCs) ---
    all_pos = jnp.concatenate([pos, ego_pos[None]], axis=0)
    all_yaw = jnp.concatenate([yaw, ego_yaw[None]], axis=0)
    all_active = jnp.concatenate(
        [npc.active, jnp.ones((1,), bool)], axis=0)
    all_speed = jnp.concatenate([speed, jnp.ones((1,)) * 10.0], axis=0)
    all_stopped = all_speed < 0.3

    def hazards_one(p, y, my_idx, my_in_junction, my_speed):
        others = all_active & (jnp.arange(all_pos.shape[0]) != my_idx)
        same_dir = yaw_difference_deg(y, all_yaw) <= 150.0
        gap = NPC_GAP_BASE + NPC_GAP_HEADWAY * my_speed
        ahead = within_distance_ahead(all_pos, p, y, gap, 45.0)
        # deadlock breaker: inside a junction, *stopped* cross traffic only
        # blocks inside a tight corridor (imminent contact) instead of the
        # full cone — a mutual-stop cycle would otherwise gridlock dense
        # suites forever, but we must never drive through a stopped car.
        imminent = within_distance_ahead(all_pos, p, y, NPC_IMMINENT, 60.0)
        cone = jnp.where(my_in_junction & all_stopped, imminent, ahead)
        # true head-on blockers (wrong-lane or opposed-connector traffic)
        # are excluded by the 150-deg same_dir gate (which exists so the
        # adjacent oncoming lane doesn't trip the 45-deg cone) — block on
        # them only inside a narrow dead-ahead corridor
        dvec = all_pos - p
        fx = dvec[:, 0] * jnp.cos(y) + dvec[:, 1] * jnp.sin(y)
        lat = -dvec[:, 0] * jnp.sin(y) + dvec[:, 1] * jnp.cos(y)
        headon = (~same_dir) & (fx > 0.0) & (fx < 6.0) \
            & (jnp.abs(lat) < 1.8)
        veh_by = ((same_dir & cone) | headon) & others
        light = red_light_hazard(p, y, light_state,
                                 map_data.light_stop_pos,
                                 map_data.light_stop_yaw,
                                 stop_distance=NPC_PROXIMITY)
        wlk = walker_hazard(p, y, walker_pos, walker_active,
                            map_data.nav_raster, map_data.world_offset,
                            proximity=NPC_PROXIMITY)
        return veh_by, light | wlk

    veh_by, other_hazard = jax.vmap(hazards_one)(
        pos, yaw, jnp.arange(pos.shape[0]), in_junction, speed)
    # --- mutual-block tiebreaker (anti-gridlock, cf. CARLA's junction
    # arbitration): two vehicles stopped on crossing junction connectors
    # can sit inside each other's imminent cone / head-on corridor forever
    # (each waits for the other), freezing the junction and — through the
    # entry gate — eventually the whole town. Break the symmetry: for a
    # *geometrically mutual* NPC pair inside a junction whose partner is
    # stopped, the lower-index vehicle ignores that one blocker and clears
    # the conflict while the partner stays held by its normal cone. Blocks
    # against the ego are never relaxed.
    npc_by = veh_by[:, :-1]                      # (N, N) NPC-vs-NPC
    n = npc_by.shape[0]
    idxs = jnp.arange(n)
    mutual = (npc_by & npc_by.T & in_junction[:, None] & in_junction[None, :]
              & stopped_npc[None, :] & (idxs[:, None] < idxs[None, :]))
    npc_by = npc_by & ~mutual
    veh = jnp.any(npc_by, axis=1) | veh_by[:, -1]
    hazard = veh | other_hazard | entry_hold
    held_only_by_ego = (stopped_npc & in_junction & npc.active
                        & veh_by[:, -1] & ~jnp.any(npc_by, axis=1)
                        & ~other_hazard & ~entry_hold)

    throttle = jnp.clip(NPC_THROTTLE_KP * (target_speed - speed), 0.0, 1.0)
    throttle = jnp.where(hazard, 0.0, throttle)
    brake = jnp.where(hazard, 1.0, 0.0)
    steer = jnp.where(hazard & (speed < 0.5), 0.0, steer)

    new_pos, new_yaw, new_speed = bicycle_step(
        pos, yaw, speed, steer, throttle, brake, dynamics, DT)

    active = npc.active
    new_pos = jnp.where(active[:, None], new_pos, pos)
    new_yaw = jnp.where(active, new_yaw, yaw)
    new_speed = jnp.where(active, new_speed, 0.0)
    out = NPCVehicleState(pos=new_pos, yaw=new_yaw, speed=new_speed,
                          wp=wp, active=active)
    if with_aux:
        return out, {'held_only_by_ego': held_only_by_ego}
    return out
