"""Expert autopilot: route-following PID + hazard stops, fully on-device.

Capability parity with RoamingAgentMine
(/root/reference/bird_view/models/roaming.py:19-100): heading-error PID to
the planner's target node (turn PID K_P=1.5, K_I=0.5; speed PID K_P=1.0),
6 m/s target speed (x0.75 through turns), emergency stop on vehicle /
red-light / walker hazards. This is the data-collection expert and the
NoCrash "Autopilot" baseline row.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import (CMD_FOLLOW, CMD_STRAIGHT, EXPERT_TARGET_SPEED,
                         EXPERT_TURN_SPEED_FACTOR)
from ..control.pid import PIDState, pid_init, pid_step
from ..engine.hazards import (red_light_hazard, vehicle_hazard,
                              walker_hazard, walker_launch_block)
from ..engine.lights import light_states_md
from ..engine.routing import route_target


HAZARD_HOLD_TICKS = 8  # keep braking 0.8 s after the last hazard frame


class ExpertState(NamedTuple):
    speed_pid: PIDState
    turn_pid: PIDState
    # hazard-release hysteresis: a walker sitting exactly on the cone
    # edge flaps the hazard bit, and each v=0 frame also shrinks the
    # walkers' vehicle-clearance margin (engine/walkers.py) — the pair
    # ratchets the walker into the creeping car's corner (round-4 Town02
    # s55-t38 audit). Holding the brake until the cone has been clear
    # for HAZARD_HOLD_TICKS breaks the ratchet.
    hold: jnp.ndarray


def expert_init(batch_shape=()) -> ExpertState:
    return ExpertState(pid_init(30, batch_shape), pid_init(30, batch_shape),
                       jnp.zeros(batch_shape, jnp.int32))


def expert_hazards(map_data, env_state, hold):
    """All expert hazard predicates + brake-hold hysteresis, ONE place.

    Shared by the benchmark expert (expert_step) and the data-collection
    expert (data/collect.py) so collected datasets teach exactly the
    behavior the benchmark expert exhibits — they drifted apart in
    round 4 (junction-entry hold, walker launch block, brake hold,
    junction-aware vehicle hazard) and freshly collected data would have
    taught the pre-fix collision-prone policy.

    Returns (braking (bool), new_hold (int32)).
    """
    ego = env_state.ego
    lstate = light_states_md(map_data, env_state.episode.light_t0,
                             env_state.episode.tick)
    # env.step cached the ego's nearest waypoint at this exact pos last
    # tick (episode.ego_wp) — no re-gather
    ego_wp = env_state.episode.ego_wp
    in_junction = map_data.wp_junction[ego_wp] >= 0
    h_veh = vehicle_hazard(ego.pos, ego.yaw, env_state.npc.pos,
                           env_state.npc.yaw, env_state.npc.active,
                           in_junction=in_junction)
    h_light = red_light_hazard(ego.pos, ego.yaw, lstate,
                               map_data.light_stop_pos,
                               map_data.light_stop_yaw)
    h_walk = walker_hazard(ego.pos, ego.yaw, env_state.walkers.pos,
                           env_state.walkers.active,
                           map_data.nav_raster, map_data.world_offset)
    h_walk = h_walk | walker_launch_block(
        ego.pos, ego.speed, env_state.walkers.pos,
        env_state.walkers.active, map_data.nav_raster,
        map_data.world_offset)
    # junction-entry hold (mirror of the NPC gate in engine/npc.py): do
    # not enter while an NPC is committed to a conflicting connector —
    # entering against the oncoming straight that shares our green would
    # end nose-to-nose mid-box, a state neither party can legally leave.
    # The reservation is read from the episode cache (refreshed by
    # env.step each tick; 1 tick stale) instead of re-deriving it.
    from ..engine.npc import EGO_ENTRY_HOLD
    res_j = env_state.episode.res_j
    res_cmask = env_state.episode.res_cmask
    res_d = env_state.episode.res_d
    # env.step cached the occupancy of this exact npc waypoint bank
    occ_bits = env_state.episode.occ_bits
    conf_row = map_data.junction_conflict[jnp.maximum(res_j, 0)]  # (K,)
    n_k = conf_row.shape[0]
    conf = jnp.uint32(0)
    for k in range(n_k):  # static K; OR conflict sets of reserved conns
        conf = conf | jnp.where((res_cmask >> k) & 1, conf_row[k],
                                jnp.uint32(0))
    h_entry = (res_j >= 0) & ~in_junction & (res_d < EGO_ENTRY_HOLD) \
        & ((occ_bits[jnp.maximum(res_j, 0)] & conf) != 0)
    hazard = h_veh | h_light | h_walk | h_entry
    new_hold = jnp.where(hazard, HAZARD_HOLD_TICKS,
                         jnp.maximum(hold - 1, 0))
    return hazard | (new_hold > 0), new_hold


def expert_step(map_data, env_state, agent_state: ExpertState):
    """One control decision for one env (vmap outside).

    Returns (control (3,), new_agent_state, hazard_flag).
    """
    ego = env_state.ego
    target_pos, target_cmd = route_target(env_state.route)

    ox = jnp.cos(ego.yaw)
    oy = jnp.sin(ego.yaw)
    d = target_pos - ego.pos
    forward = ox * d[0] + oy * d[1]
    lateral = -oy * d[0] + ox * d[1]
    theta = jnp.arctan2(lateral, forward)

    turn_pid, steer = pid_step(agent_state.turn_pid, theta,
                               1.5, 0.5, 0.0)

    target_speed = jnp.where(
        (target_cmd == CMD_STRAIGHT) | (target_cmd == CMD_FOLLOW),
        EXPERT_TARGET_SPEED, EXPERT_TARGET_SPEED * EXPERT_TURN_SPEED_FACTOR)
    speed_pid, throttle = pid_step(agent_state.speed_pid,
                                   target_speed - ego.speed, 1.0, 0.0, 0.0)

    braking, hold = expert_hazards(map_data, env_state, agent_state.hold)

    steer = jnp.clip(steer, -1.0, 1.0)
    throttle = jnp.clip(throttle, 0.0, 1.0)
    control = jnp.where(
        braking,
        jnp.array([0.0, 0.0, 1.0]),
        jnp.stack([steer, throttle, jnp.zeros_like(steer)]))
    return control, ExpertState(speed_pid, turn_pid, hold), braking
