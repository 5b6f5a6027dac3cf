"""The batched driving environment: host-side reset, device-side step.

One jitted `step(state, control) -> (state, obs)` collapses the whole
reference hot loop (SURVEY.md section 3.1): CARLA server physics tick +
tracker updates + planner step + observation assembly, for every env in
the batch at once. Episode layout (init/ready/tick/apply_control semantics)
mirrors CarlaWrapper + PointGoalSuite (carla_utils.py:489-602,
goal_suite.py:41-142).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CMD_FOLLOW, DT, MAX_TICKS, SUCCESS_DIST)
from ..maps import build_map_data, get_roadnet
from ..maps.map_data import MapData, nearest_waypoint_np
from .collision import (ego_lane_invasion, ego_static_collision,
                        ego_vehicle_collision, ego_walker_collision)
from .dynamics import DEFAULT_DYNAMICS, DynamicsParams, bicycle_step
from .lights import PHASE_S, RED, light_states_md
from .npc import EGO_RESERVE_DIST, junction_occupancy, npc_vehicle_step
from .routing import (MAX_ROUTE, distance_to_goal, intended_connector,
                      make_route_state, route_step, route_target,
                      route_timeout_frames)
from .state import (EgoState, EnvState, EpisodeState, NPCVehicleState,
                    RouteState, WalkerState)
from .walkers import walker_step


@dataclass(frozen=True)
class EnvConfig:
    town: str = 'Town01'
    n_vehicles: int = 0
    n_pedestrians: int = 0
    max_vehicles: int = 0       # padded shapes; defaults to n_vehicles
    max_walkers: int = 0
    col_is_failure: bool = False
    respawn_peds: bool = True
    success_dist: float = SUCCESS_DIST
    # planner parameters: (2.5, 9.0, 1.5) for benchmarks (goal_suite.py:49),
    # (1.0, 7.5, 5.0) for the data collector (data_collector.py:118)
    route_resolution: float = 2.5
    threshold_before: float = 9.0
    threshold_after: float = 1.5

    def __post_init__(self):
        object.__setattr__(self, 'max_vehicles',
                           max(self.max_vehicles, self.n_vehicles, 1))
        object.__setattr__(self, 'max_walkers',
                           max(self.max_walkers, self.n_pedestrians, 1))


class DrivingEnv:
    """Holds static map tables + config; all stepping is pure-functional."""

    def __init__(self, config: EnvConfig,
                 dynamics: DynamicsParams = DEFAULT_DYNAMICS):
        self.config = config
        self.net = get_roadnet(config.town)
        map_np = build_map_data(config.town)
        self.map_np = map_np
        self.map_data: MapData = jax.tree.map(jnp.asarray, map_np)
        self.dynamics = dynamics

    # ------------------------------------------------------------------ reset
    def reset_np(self, seed: int, start: int, target: int,
                 weather: int = 1) -> EnvState:
        """Host-side single-env reset mirroring CarlaWrapper.init +
        PointGoalSuite.ready (route plan + timeout). Returns an unbatched
        EnvState of numpy/jnp leaves; stack with `stack_states`."""
        cfg = self.config
        rng = np.random.RandomState(seed * 9176 + start * 31 + target)
        spawn_pos = self.map_np.spawn_pos
        spawn_yaw = self.map_np.spawn_yaw

        start_pos = spawn_pos[start % len(spawn_pos)]
        start_yaw = spawn_yaw[start % len(spawn_pos)]
        target_pos = spawn_pos[target % len(spawn_pos)]

        route_pos, route_cmd = self.net.plan_route(
            start_pos, target_pos, resolution=cfg.route_resolution,
            start_yaw=float(start_yaw))
        route = make_route_state(route_pos, route_cmd)
        timeout = route_timeout_frames(route_pos)

        ego = EgoState(
            pos=jnp.asarray(start_pos, jnp.float32),
            yaw=jnp.asarray(start_yaw, jnp.float32),
            speed=jnp.asarray(0.0, jnp.float32),
            prev_vel=jnp.zeros(2, jnp.float32),
            steer=jnp.asarray(0.0, jnp.float32),
            throttle=jnp.asarray(0.0, jnp.float32),
            brake=jnp.asarray(0.0, jnp.float32))

        # --- NPC vehicles at spawn points away from the hero ---
        v = cfg.max_vehicles
        far = np.hypot(*(spawn_pos - start_pos).T) > 15.0
        cand = np.nonzero(far)[0]
        rng.shuffle(cand)
        chosen = cand[:cfg.n_vehicles]
        npc_pos = np.zeros((v, 2), np.float32)
        npc_yaw = np.zeros((v,), np.float32)
        npc_wp = np.zeros((v,), np.int32)
        npc_active = np.zeros((v,), bool)
        for i, ci in enumerate(chosen):
            npc_pos[i] = spawn_pos[ci]
            npc_yaw[i] = spawn_yaw[ci]
            wp = self.net.nearest_waypoint(spawn_pos[ci],
                                           yaw=float(spawn_yaw[ci]))
            npc_wp[i] = self.map_np.wp_next[wp, 0] \
                if self.map_np.wp_next[wp, 0] >= 0 else wp
            npc_active[i] = True
        npc = NPCVehicleState(
            pos=jnp.asarray(npc_pos), yaw=jnp.asarray(npc_yaw),
            speed=jnp.zeros((v,), jnp.float32),
            wp=jnp.asarray(npc_wp), active=jnp.asarray(npc_active))

        # --- walkers on the sidewalk band (speed 1 + U(0,1),
        #     carla_utils.py:538) ---
        p = cfg.max_walkers
        ws = self.map_np.walker_spawn
        widx = rng.randint(0, len(ws), size=p)
        wpos = ws[widx].astype(np.float32)
        # initial goal: a same-sidewalk neighbor of the spawn point (the
        # precomputed stroll table), so nobody treks cross-town on reset
        nbrs = self.map_np.walker_neighbors
        wtgt_idx = nbrs[widx, rng.randint(0, nbrs.shape[1], size=p)]
        walkers = WalkerState(
            pos=jnp.asarray(wpos),
            yaw=jnp.zeros((p,), jnp.float32),
            speed=jnp.asarray(1.0 + rng.rand(p).astype(np.float32)),
            target=jnp.asarray(ws[wtgt_idx].astype(np.float32)),
            target_idx=jnp.asarray(wtgt_idx.astype(np.int32)),
            stuck_ticks=jnp.zeros((p,), jnp.int32),
            anchor=jnp.asarray(wpos),
            anchor_ticks=jnp.zeros((p,), jnp.int32),
            active=jnp.asarray(np.arange(p) < cfg.n_pedestrians))

        n_junctions = len(self.map_np.junction_n_phases)
        t0 = rng.rand(n_junctions).astype(np.float32) * 3.0 * PHASE_S
        episode = EpisodeState(
            tick=jnp.asarray(0, jnp.int32),
            timestamp_active=jnp.asarray(0, jnp.int32),
            collided=jnp.asarray(False),
            invaded=jnp.asarray(False),
            ran_light=jnp.asarray(False),
            total_lights=jnp.asarray(0, jnp.int32),
            total_lights_ran=jnp.asarray(0, jnp.int32),
            last_light=jnp.asarray(-1, jnp.int32),
            timeout=jnp.asarray(timeout, jnp.float32),
            target_pos=jnp.asarray(target_pos, jnp.float32),
            start_pos=jnp.asarray(start_pos, jnp.float32),
            weather=jnp.asarray(weather, jnp.int32),
            light_t0=jnp.asarray(t0),
            rng=jax.random.PRNGKey(seed * 7919 + start).astype(jnp.uint32),
            done=jnp.asarray(False),
            success=jnp.asarray(False),
            res_j=jnp.asarray(-1, jnp.int32),
            res_cmask=jnp.asarray(0, jnp.uint32),
            res_d=jnp.asarray(jnp.inf, jnp.float32),
            ego_wp=jnp.asarray(
                nearest_waypoint_np(self.map_np, start_pos), jnp.int32),
            occ_bits=junction_occupancy(self.map_data, jnp.asarray(npc_wp),
                                        jnp.asarray(npc_active))[0])

        return EnvState(ego=ego, npc=npc, walkers=walkers, route=route,
                        episode=episode)

    # ------------------------------------------------------------------- step
    def step(self, state: EnvState, control) -> Tuple[EnvState, dict]:
        """One 0.1 s tick, single env (vmap over the batch outside).

        control: (3,) [steer, throttle, brake].
        """
        cfg = self.config
        m = self.map_data
        ep = state.episode

        key, k_walk = jax.random.split(ep.rng, 2)

        steer, throttle, brake = control[0], control[1], control[2]
        pos, yaw, speed = bicycle_step(
            state.ego.pos, state.ego.yaw, state.ego.speed,
            steer, throttle, brake, self.dynamics, DT)
        fwd = jnp.stack([jnp.cos(yaw), jnp.sin(yaw)])
        vel = fwd * speed
        ego = EgoState(pos=pos, yaw=yaw, speed=speed,
                       prev_vel=state.ego.prev_vel,
                       steer=steer, throttle=throttle, brake=brake)

        tick = ep.tick + 1
        lstate = light_states_md(m, ep.light_t0, tick)

        # the ego reserves its planned junction connector(s) while bearing
        # down on the entry — and for as long as it is inside — so NPCs
        # yield to it like to a committed vehicle (engine/npc.py junction
        # gate); a stopped ego outside (e.g. at a red light) reserves
        # nothing and cross traffic flows
        res_j, res_c, res_d = intended_connector(m, state.route, pos)
        from .routing import nearest_waypoint
        ego_wp = nearest_waypoint(m.grid_idx, m.world_offset, pos)
        ego_inside = m.wp_junction[ego_wp] >= 0
        reserve = (res_j >= 0) & (
            ego_inside | ((res_d < EGO_RESERVE_DIST) & (speed > 1.0)))
        npc, npc_aux = npc_vehicle_step(
            state.npc, m, pos, yaw, state.walkers.pos, state.walkers.active,
            lstate, jnp.sum(ep.rng) + tick.astype(jnp.uint32),
            self.dynamics,
            ego_res_j=jnp.where(reserve, res_j, -1), ego_res_c=res_c,
            ego_wp=ego_wp, with_aux=True)
        walkers = walker_step(state.walkers, m, pos, k_walk,
                              vehicle_pos=npc.pos,
                              vehicle_active=npc.active,
                              vehicle_speed=npc.speed, ego_speed=speed,
                              vehicle_yaw=npc.yaw, ego_yaw=yaw,
                              respawn_peds=self.config.respawn_peds)

        # --- collisions (carla_utils.py:680-714 analog, incl. the impulse
        #     threshold as relative-motion gating) ---
        col_veh = ego_vehicle_collision(pos, yaw, npc.pos, npc.yaw,
                                        npc.active, ego_speed=speed,
                                        veh_speed=npc.speed)
        col_walk = ego_walker_collision(pos, yaw, walkers.pos,
                                        walkers.active, ego_speed=speed)
        col_static = ego_static_collision(pos, yaw, m.walkable_raster,
                                          m.world_offset, ego_speed=speed)
        collided = ep.collided | col_veh | col_walk | col_static
        invaded = ep.invaded | ego_lane_invasion(pos, yaw, m.lane_raster,
                                                 m.world_offset)

        # --- TrafficTracker (carla_utils.py:228-339) ---
        rel = pos - m.light_stop_pos
        cos_l = jnp.cos(m.light_stop_yaw)
        sin_l = jnp.sin(m.light_stop_yaw)
        along = rel[:, 0] * cos_l + rel[:, 1] * sin_l
        lateral = -rel[:, 0] * sin_l + rel[:, 1] * cos_l
        prev_rel = state.ego.pos - m.light_stop_pos
        prev_along = prev_rel[:, 0] * cos_l + prev_rel[:, 1] * sin_l
        in_lane = jnp.abs(lateral) < 2.5
        crossed = (prev_along <= 0.0) & (along > 0.0) & in_lane
        # ran-light is judged ONLY against the closest light, as in the
        # reference (get_closest_light, carla_utils.py:259-276,279-293):
        # checking every stop line falsely counts sweeping across a cross
        # street's line mid-turn while ego's own light is green
        nearest_light = jnp.argmin(
            jnp.linalg.norm(pos[None, :] - m.light_pole_pos, axis=-1))
        ran_now = crossed[nearest_light] & (lstate[nearest_light] == RED)
        # active-light counting: nearest governed approach containing us
        in_zone = in_lane & (along > -10.0) & (along < 0.5)
        zone_dist = jnp.where(in_zone, -along, jnp.inf)
        active_light = jnp.where(jnp.any(in_zone),
                                 jnp.argmin(zone_dist), -1)
        new_light = (active_light >= 0) & (active_light != ep.last_light)
        total_lights = ep.total_lights + new_light.astype(jnp.int32)
        last_light = jnp.where(active_light >= 0, active_light,
                               ep.last_light)

        # --- route follower (goal_suite.py:58-66) ---
        route = route_step(state.route, pos, cfg.threshold_before,
                           cfg.threshold_after)
        target_pos_node, _ = route_target(route)

        timestamp_active = ep.timestamp_active + 1

        # --- terminal conditions (goal_suite.py:97-109) ---
        dist_target = jnp.linalg.norm(pos - ep.target_pos)
        success = dist_target <= cfg.success_dist
        failure = (timestamp_active.astype(jnp.float32) >= ep.timeout) \
            | (tick >= MAX_TICKS)
        if cfg.col_is_failure:
            failure = failure | collided
        done = ep.done | success | failure

        episode = ep._replace(
            tick=tick, timestamp_active=timestamp_active,
            collided=collided, invaded=invaded, ran_light=ran_now,
            total_lights=total_lights,
            total_lights_ran=ep.total_lights_ran + ran_now.astype(jnp.int32),
            last_light=last_light, rng=key, done=done,
            success=ep.success | success,
            res_j=res_j, res_cmask=res_c.astype(jnp.uint32), res_d=res_d,
            ego_wp=ego_wp,
            # expert-hold occupancy: drop NPCs stopped in the box solely
            # because of the ego — holding for them is a permanent
            # ego<->NPC cycle (h_veh still guards actual contact)
            occ_bits=junction_occupancy(
                m, npc.wp, npc.active & ~npc_aux['held_only_by_ego'])[0])

        new_state = EnvState(ego=ego._replace(prev_vel=vel), npc=npc,
                             walkers=walkers, route=route, episode=episode)

        acc = (vel - state.ego.prev_vel) / DT
        obs = {
            'position': pos,
            'orientation': fwd,
            'velocity': vel,
            'acceleration': acc,
            'speed': speed,
            'command': route.command,
            'node': route.pos[jnp.clip(route.checkpoint_idx, 0,
                                       route.length - 1)],
            'next': target_pos_node,
            'collided': collided,
            'invaded': invaded,
            'distance_to_goal': distance_to_goal(route),
            'light_state': lstate,
            'done': done,
            'success': episode.success,
            'tick': tick,
        }
        return new_state, obs

    def observe(self, state: EnvState) -> dict:
        """Observation dict for the *current* state (no stepping): what
        get_observations returns in the reference (carla_utils.py:574-589,
        goal_suite.py:68-75) minus the rendered sensors, which live in
        lbc_tpu.render."""
        ego = state.ego
        route = state.route
        fwd = jnp.stack([jnp.cos(ego.yaw), jnp.sin(ego.yaw)])
        vel = fwd * ego.speed
        return {
            'position': ego.pos,
            'orientation': fwd,
            'velocity': vel,
            'acceleration': (vel - ego.prev_vel) / DT,
            'speed': ego.speed,
            'command': route.command,
            'node': route.pos[jnp.clip(route.checkpoint_idx, 0,
                                       route.length - 1)],
            'next': route.pos[jnp.minimum(route.next_idx,
                                          route.length - 1)],
            'collided': state.episode.collided,
            'invaded': state.episode.invaded,
            'distance_to_goal': distance_to_goal(route),
            'done': state.episode.done,
            'success': state.episode.success,
            'tick': state.episode.tick,
        }

    # ----------------------------------------------------------- conveniences
    @cached_property
    def step_batch(self):
        """jit(vmap(step)) over a leading env axis."""
        return jax.jit(jax.vmap(self.step))

    def warmup(self, state: EnvState, ticks: int = 50) -> EnvState:
        """ready()'s 50 settle ticks with the hero parked
        (carla_utils.py:531-552); resets clocks after."""
        park = jnp.zeros(state.ego.pos.shape[:-1] + (3,), jnp.float32)

        def body(s, _):
            s2, _obs = self.step_batch(s, park) \
                if s.ego.pos.ndim == 2 else self.step(s, park)
            return s2, None

        state, _ = jax.lax.scan(body, state, None, length=ticks)
        ep = state.episode
        return state._replace(episode=ep._replace(
            tick=jnp.zeros_like(ep.tick),
            timestamp_active=jnp.zeros_like(ep.timestamp_active)))


def stack_states(states) -> EnvState:
    """Stack unbatched EnvStates into one batched pytree on device."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)
