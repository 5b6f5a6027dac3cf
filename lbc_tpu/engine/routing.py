"""On-device route following (LocalPlannerNew semantics) and lattice queries.

Mirrors /root/reference/PythonAPI/agents/navigation/local_planner.py:291-389
exactly: scan up to MAX_SKIP queued nodes, advance the checkpoint to the
farthest node within threshold (THRESHOLD_BEFORE=9.0 m when transitioning
from LANEFOLLOW into a turn command, THRESHOLD_AFTER=1.5 m otherwise), pop
passed nodes. The deque becomes an index into a padded route array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CMD_FOLLOW, FPS, MAX_SKIP, ROUTE_RESOLUTION,
                         THRESHOLD_AFTER, THRESHOLD_BEFORE, TIMEOUT_BASE_S)
from .state import RouteState

MAX_ROUTE = 1024


def make_route_state(route_pos: np.ndarray, route_cmd: np.ndarray,
                     max_route: int = MAX_ROUTE) -> RouteState:
    """Host-side: pad a planned route into a RouteState (numpy)."""
    n = len(route_pos)
    assert n <= max_route, f'route too long: {n}'
    pos = np.zeros((max_route, 2), np.float32)
    cmd = np.full((max_route,), CMD_FOLLOW, np.int32)
    pos[:n] = route_pos
    pos[n:] = route_pos[-1]
    cmd[:n] = route_cmd
    seg = np.hypot(*np.diff(route_pos, axis=0).T)
    cumdist = np.zeros((max_route,), np.float32)
    cumdist[1:n] = np.cumsum(seg)
    cumdist[n:] = cumdist[n - 1]
    return RouteState(
        pos=jnp.asarray(pos), cmd=jnp.asarray(cmd),
        cumdist=jnp.asarray(cumdist),
        length=jnp.asarray(n, jnp.int32),
        next_idx=jnp.asarray(0, jnp.int32),
        checkpoint_idx=jnp.asarray(-1, jnp.int32),
        command=jnp.asarray(CMD_FOLLOW, jnp.int32),
    )


def route_timeout_frames(route_pos: np.ndarray) -> float:
    """calculate_timeout (local_planner.py:373-389)."""
    dist = float(np.sum(np.hypot(*np.diff(route_pos, axis=0).T)))
    timeout_s = (dist / 1000.0 / 5.0) * 3600.0 + TIMEOUT_BASE_S
    return timeout_s * FPS


def route_step(route: RouteState, ego_pos,
               threshold_before: float = THRESHOLD_BEFORE,
               threshold_after: float = THRESHOLD_AFTER) -> RouteState:
    """One planner tick (single env; vmap outside).

    Benchmark episodes use (9.0, 1.5) per goal_suite.py:49; the data
    collector's NoisyAgent plans at (7.5, 5.0) per data_collector.py:118.
    """
    def body(o, carry):
        cur_cmd, max_o = carry
        idx = jnp.minimum(route.next_idx + o, route.length - 1)
        node_pos = route.pos[idx]
        node_cmd = route.cmd[idx]
        dist = jnp.linalg.norm(ego_pos - node_pos)
        threshold = jnp.where(
            (cur_cmd == CMD_FOLLOW) & (node_cmd != CMD_FOLLOW),
            threshold_before, threshold_after)
        in_range = (dist < threshold) & (route.next_idx + o < route.length)
        cur_cmd = jnp.where(in_range, node_cmd, cur_cmd)
        max_o = jnp.where(in_range, o, max_o)
        return cur_cmd, max_o

    cur_cmd, max_o = jax.lax.fori_loop(
        0, MAX_SKIP + 1, body, (route.command, jnp.asarray(-1, jnp.int32)))

    advanced = max_o >= 0
    checkpoint_idx = jnp.where(
        advanced, jnp.minimum(route.next_idx + max_o, route.length - 1),
        route.checkpoint_idx)
    next_idx = jnp.where(
        advanced,
        jnp.minimum(route.next_idx + max_o + 1, route.length - 1),
        route.next_idx)
    return route._replace(next_idx=next_idx, checkpoint_idx=checkpoint_idx,
                          command=cur_cmd)


def route_target(route: RouteState):
    """(target_pos, target_cmd): head of the remaining queue."""
    idx = jnp.minimum(route.next_idx, route.length - 1)
    return route.pos[idx], route.cmd[idx]


def route_checkpoint(route: RouteState):
    """(node_pos, command) of the current checkpoint; before any advance the
    node is the route start (the reference uses ego's map waypoint)."""
    idx = jnp.clip(route.checkpoint_idx, 0, route.length - 1)
    return route.pos[idx], route.command


def distance_to_goal(route: RouteState):
    total = route.cumdist[route.length - 1]
    head = jnp.minimum(route.next_idx, route.length - 1)
    return total - route.cumdist[head]


ENTRY_LOOKAHEAD = 8  # route nodes at 2.5 m spacing -> ~20 m of route


def intended_connector(map_data, route: 'RouteState', ego_pos):
    """(junction, conn_bitmask, dist): the first junction on the route
    ahead of the follower head (junction -1 / mask 0 when none is within
    ENTRY_LOOKAHEAD nodes) and the OR of the local connector bits its
    route points snap onto.

    Route points inside a junction lie on the planned connector's lattice
    chain, so their nearest waypoints recover (junction id, connector
    index) for the entry gates in engine/npc.py (the ego's reservation)
    and agents/autopilot.py (the expert's own hold). Near a crossing two
    connectors' waypoints are equidistant and a single-point snap can
    pick the wrong one — OR-ing the bits of every in-junction lookahead
    point keeps the true connector in the mask. Snaps whose waypoint
    heading disagrees with the route tangent by > 60 deg are dropped:
    they belong to the crossing movement, not ours, and reserving them
    makes NPCs over-yield and the expert over-hold.
    """
    offs = jnp.arange(ENTRY_LOOKAHEAD)
    idx = jnp.minimum(route.next_idx + offs, route.length - 1)
    pts = route.pos[idx]
    wps = nearest_waypoint(map_data.grid_idx, map_data.world_offset, pts)
    js = map_data.wp_junction[wps]
    cs = jnp.maximum(map_data.wp_conn[wps], 0)
    # route tangent at each lookahead point (forward diff; inbound
    # segment at the route tail / padded region)
    fwd = route.pos[jnp.minimum(idx + 1, route.length - 1)] - pts
    back = pts - route.pos[jnp.maximum(idx - 1, 0)]
    use_back = jnp.linalg.norm(fwd, axis=-1, keepdims=True) < 1e-3
    tang = jnp.where(use_back, back, fwd)
    tyaw = jnp.arctan2(tang[:, 1], tang[:, 0])
    dyaw = jnp.abs(jnp.mod(map_data.wp_yaw[wps] - tyaw + jnp.pi,
                           2 * jnp.pi) - jnp.pi)
    degenerate = jnp.linalg.norm(tang, axis=-1) < 1e-3
    heading_ok = (dyaw < jnp.deg2rad(60.0)) | degenerate
    isj = (js >= 0) & heading_ok
    first = jnp.argmax(isj)
    any_j = jnp.any(isj)
    j = jnp.where(any_j, js[first], -1)
    in_first = isj & (js == js[first])
    cmask = jax.lax.reduce(
        jnp.where(in_first, jnp.uint32(1) << cs.astype(jnp.uint32),
                  jnp.uint32(0)),
        jnp.uint32(0), jnp.bitwise_or, (0,))
    cmask = jnp.where(any_j, cmask, jnp.uint32(0))
    dist = jnp.where(any_j, jnp.linalg.norm(pts[first] - ego_pos),
                     jnp.float32(jnp.inf))
    return j, cmask, dist


# ----------------------------------------------------------- lattice queries
GRID_CELL = 2.0


def nearest_waypoint(map_grid_idx, world_offset, pos):
    """Device-side nearest lattice waypoint via the 2 m hash grid."""
    cell = jnp.floor((pos - world_offset) / GRID_CELL).astype(jnp.int32)
    gh, gw = map_grid_idx.shape
    cx = jnp.clip(cell[..., 0], 0, gw - 1)
    cy = jnp.clip(cell[..., 1], 0, gh - 1)
    return map_grid_idx[cy, cx]
