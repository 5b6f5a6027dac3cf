"""Packed, device-ready map tables.

The TPU-native replacement for CARLA's server-side map (SURVEY.md section
2.3): every map query the reference performs over RPC becomes a gather into
these arrays inside the jitted step.
"""
from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import numpy as np

from ..constants import PIXELS_PER_METER
from .roadnet import LATTICE_SPACING, RoadNetwork, get_roadnet

GRID_CELL = 2.0  # m, nearest-waypoint hash grid


class MapData(NamedTuple):
    """All-array map representation (pure numpy here; jnp after device put).

    Shapes: N = lattice waypoints, L = lights, S = spawn points,
    J = junction nodes, (H, W) = raster at 5 px/m.
    """
    # rasters
    road_raster: np.ndarray       # (H, W) uint8 {0,1}
    lane_raster: np.ndarray       # (H, W) uint8 {0,1}
    walkable_raster: np.ndarray   # (H, W) uint8 {0,1}: road + sidewalk band
    nav_raster: np.ndarray        # (H, W) uint32: 3x3-neighborhood pack of
    # (walkable, road) — bit (dy+1)*3+(dx+1) = walkable, bit 9+same = road,
    # edge-replicated. One gather at a walker's pixel answers every
    # +-1-px candidate query (engine/walkers.py)
    world_offset: np.ndarray      # (2,) f32; pixel = 5 * (world - offset)
    # waypoint lattice
    wp_pos: np.ndarray            # (N, 2) f32
    wp_yaw: np.ndarray            # (N,) f32
    wp_next: np.ndarray           # (N, 3) int32, -1 padded
    wp_n_next: np.ndarray         # (N,) int32
    wp_seg: np.ndarray            # (N,) int32
    wp_is_junction: np.ndarray    # (N,) bool
    wp_junction: np.ndarray       # (N,) int32 junction node id, -1 on roads
    wp_conn: np.ndarray           # (N,) int32 connector index local to the
    # waypoint's junction (-1 on roads); indexes junction_conflict bits
    junction_conflict: np.ndarray  # (J, K) uint32: bit b of [j, k] = 1 iff
    # connector k and connector b of junction j have geometrically
    # conflicting paths (cross/merge closer than a vehicle width) — the
    # "don't enter while a conflicting movement is in the box" gate in
    # engine/npc.py and agents/autopilot.py reads these masks
    # nearest-waypoint hash grid
    grid_idx: np.ndarray          # (GH, GW) int32
    # spawn points
    spawn_pos: np.ndarray         # (S, 2) f32
    spawn_yaw: np.ndarray         # (S,) f32
    # traffic lights
    light_pole_pos: np.ndarray    # (L, 2) f32 (physical pole; BEV circles
    #                               + TrafficTracker closest-light)
    light_draw_pos: np.ndarray    # (L, 2) f32 camera head position: across
    # the junction on the governed approach's axis, so a driver AT the
    # stop line sees their OWN phase. The physical pole sits ~4 m BEHIND
    # the stop line (CARLA placement) — rendering heads there left every
    # side-road approach of a T-junction with no same-phase head in FOV
    # (the round-3 light-deadlock class; tests/test_camera_contract.py).
    # CARLA's UE4 meshes hang driver-facing heads over the far side; this
    # is the analytic equivalent.
    light_stop_pos: np.ndarray    # (L, 2) f32 (stop line on governed lane)
    light_stop_yaw: np.ndarray    # (L,) f32 (approach heading)
    light_junction: np.ndarray    # (L,) int32
    light_phase: np.ndarray       # (L,) int32 index within junction group
    junction_n_phases: np.ndarray  # (J,) int32
    junction_green_s: np.ndarray  # (J,) f32 per-junction green duration
    junction_yellow_s: np.ndarray  # (J,) f32 per-junction yellow duration
    # (map_utils.py:786-854 reads per-light durations off the CARLA
    # actors; CARLA 0.9.6 town defaults are uniform 10 s / 3 s)
    # walker navigation
    walker_spawn: np.ndarray      # (WS, 2) f32 points on the sidewalk band
    walker_spawn_component: np.ndarray  # (WS,) int32 sidewalk-piece id —
    # same id = reachable without crossing a road
    walker_neighbors: np.ndarray  # (WS, 16) int32 same-piece points 4-25 m
    walker_cross_neighbors: np.ndarray  # (WS, 8) int32 other-piece points
    # 8-30 m away (deliberate road crossings); padded with self-index
    # analytic road geometry (gather-free rendering)
    road_capsules: np.ndarray     # (M, 5) f32 [x0,y0,x1,y1,half_width]
    lane_dashes: np.ndarray       # (M, 6) f32 [x0,y0,x1,y1,s0,seg_len]

    @property
    def n_waypoints(self):
        return self.wp_pos.shape[0]


def rasterize(net: RoadNetwork):
    """Re-render road / lane-marking rasters from the vector network."""
    import cv2

    h, w = net.mask_shape
    ppm = net.pixels_per_meter
    off = net.world_offset
    road = np.zeros((h, w), np.uint8)
    lane = np.zeros((h, w), np.uint8)

    def to_px(pts):
        return np.round((np.asarray(pts) - off) * ppm).astype(np.int32)

    width_px = int(round(2 * net.lane_width * ppm))  # full road width
    for edge in net.raw_edges:
        pts = to_px(edge['points'])
        cv2.polylines(road, [pts], False, 1, thickness=width_px,
                      lineType=cv2.LINE_8)

    # dashed center divider: 3 m on / 3 m off (visual stand-in for the
    # reference's topology-derived broken markings, map_utils.py:367-498)
    from .roadnet import resample_polyline
    for edge in net.raw_edges:
        dense = resample_polyline(np.asarray(edge['points']), 1.0)
        for i in range(0, len(dense) - 3, 6):
            seg = to_px(dense[i:i + 4])
            cv2.polylines(lane, [seg], False, 1, thickness=2,
                          lineType=cv2.LINE_8)

    # walkable band: road dilated by ~3.5 m of sidewalk (CARLA walkers roam
    # sidewalks and, with the reference's navmesh fix, cross roads)
    sidewalk_px = int(round(3.5 * ppm))
    kernel = cv2.getStructuringElement(
        cv2.MORPH_ELLIPSE, (2 * sidewalk_px + 1, 2 * sidewalk_px + 1))
    walkable = cv2.dilate(road, kernel)

    return road, lane, walkable


def _pack_nav_raster(walkable: np.ndarray, road: np.ndarray) -> np.ndarray:
    """3x3-neighborhood bit-pack of (walkable, road), edge-replicated.

    out[y, x] bit (dy+1)*3+(dx+1)     = walkable[clip(y+dy), clip(x+dx)]
    out[y, x] bit 9 + (dy+1)*3+(dx+1) = road[clip(y+dy), clip(x+dx)]

    A walker moves < 0.2 m/tick (< 1 px at 5 px/m), so every sidestep
    candidate pixel lies in this neighborhood: ONE uint32 gather per
    walker replaces three per-candidate raster gathers in
    engine/walkers.py — random HBM gathers scale with batch size and were
    ~45%% of the env step at batch 1024 on TPU."""
    h, w = walkable.shape
    out = np.zeros((h, w), np.uint32)
    ys0, xs0 = np.arange(h), np.arange(w)
    bit = 0
    for dy in (-1, 0, 1):
        ys = np.clip(ys0 + dy, 0, h - 1)
        for dx in (-1, 0, 1):
            xs = np.clip(xs0 + dx, 0, w - 1)
            out |= (walkable[ys][:, xs] > 0).astype(np.uint32) << bit
            out |= (road[ys][:, xs] > 0).astype(np.uint32) << (9 + bit)
            bit += 1
    return out


CONNECTOR_CONFLICT_M = 2.4  # min path separation (~vehicle width + margin)


def _connector_tables(net: RoadNetwork):
    """Label junction connectors and precompute pairwise path conflicts.

    Two connectors of the same junction conflict when a vehicle on each
    could meet: their polylines pass within CONNECTOR_CONFLICT_M
    (crossing paths — e.g. a left turn vs. the oncoming straight that
    shares its green under the opposing-phase light grouping), or they
    merge into the same exit lane. Connectors diverging from the same
    entry never conflict (that is ordinary leader-following).

    Returns (wp_conn (N,) int32, conflict (n_nodes, K) uint32) where K is
    the max connectors at any junction (bit-packed; asserted <= 32).
    CARLA sequences junction entry server-side inside the traffic
    manager; this is the table-driven TPU analog — one gather + one AND
    per entering vehicle instead of per-actor negotiation.
    """
    from scipy.spatial.distance import cdist

    n_nodes = len(net.nodes)
    seg_conn = np.full(len(net.segments), -1, np.int32)
    by_junction: dict = {}
    for s in net.segments:
        if s.is_junction:
            by_junction.setdefault(s.start_node, []).append(s)
    n_k = max((len(v) for v in by_junction.values()), default=1)
    assert n_k <= 32, f'junction with {n_k} connectors overflows uint32'
    conflict = np.zeros((n_nodes, n_k), np.uint32)
    for node, conns in by_junction.items():
        for k, s in enumerate(conns):
            seg_conn[s.seg_id] = k
        for a in range(len(conns)):
            for b in range(a + 1, len(conns)):
                sa, sb = conns[a], conns[b]
                if sa._from == sb._from:
                    continue
                conf = (sa._to == sb._to) or (
                    cdist(sa.points, sb.points).min()
                    < CONNECTOR_CONFLICT_M)
                if conf:
                    conflict[node, a] |= np.uint32(1) << np.uint32(b)
                    conflict[node, b] |= np.uint32(1) << np.uint32(a)
    return seg_conn[net.wp_seg], conflict


def _nearest_grid(net: RoadNetwork, h_m: float, w_m: float):
    gh = int(np.ceil(h_m / GRID_CELL)) + 1
    gw = int(np.ceil(w_m / GRID_CELL)) + 1
    ys = net.world_offset[1] + (np.arange(gh) + 0.5) * GRID_CELL
    xs = net.world_offset[0] + (np.arange(gw) + 0.5) * GRID_CELL
    gx, gy = np.meshgrid(xs, ys)
    cells = np.stack([gx.ravel(), gy.ravel()], axis=1)
    _, idx = net._kdtree.query(cells)
    return idx.reshape(gh, gw).astype(np.int32)


def _walker_spawn_points(road, walkable, world_offset, ppm, n=2048,
                         seed=0):
    """Deterministic sample of sidewalk-band points (walkable minus road)
    plus the connected sidewalk piece each point belongs to (same piece =
    no road crossing needed)."""
    from scipy import ndimage
    band = (walkable > 0) & (road == 0)
    labels, _ = ndimage.label(band)
    ys, xs = np.nonzero(band)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(ys), size=min(n, len(ys)), replace=False)
    comp = labels[ys[idx], xs[idx]].astype(np.int32)
    pts = np.stack([xs[idx], ys[idx]], axis=1).astype(np.float32) / ppm
    pts = pts + np.asarray(world_offset, np.float32)

    # neighbor tables: same-piece strolls and cross-street hops, so target
    # selection is an O(1) gather with guaranteed locality
    from scipy.spatial import cKDTree
    tree = cKDTree(pts)
    m = len(pts)
    nbrs = np.tile(np.arange(m, dtype=np.int32)[:, None], (1, 16))
    cross = np.tile(np.arange(m, dtype=np.int32)[:, None], (1, 8))
    pairs = tree.query_ball_point(pts, 25.0)
    rng2 = np.random.RandomState(seed + 1)
    for i, cand in enumerate(pairs):
        cand = np.asarray(cand)
        d = np.hypot(*(pts[cand] - pts[i]).T)
        same = cand[(comp[cand] == comp[i]) & (d > 4.0)]
        other = cand[(comp[cand] != comp[i]) & (d > 8.0)]
        if len(same):
            pick = rng2.choice(same, size=16, replace=len(same) < 16)
            nbrs[i] = pick
        if len(other):
            pick = rng2.choice(other, size=8, replace=len(other) < 8)
            cross[i] = pick
    return pts, comp, nbrs, cross


@lru_cache(maxsize=4)
def build_map_data(town: str) -> MapData:
    net = get_roadnet(town)
    road, lane, walkable = rasterize(net)
    h_m = net.mask_shape[0] / net.pixels_per_meter
    w_m = net.mask_shape[1] / net.pixels_per_meter
    grid = _nearest_grid(net, h_m, w_m)

    wp_is_junction = net._seg_is_junction[net.wp_seg]
    # junction connectors carry start_node == end_node == the junction
    # node (roadnet.py:_connect_junctions); roads map to -1
    seg_junction = np.array(
        [s.start_node if s.is_junction else -1 for s in net.segments],
        np.int32)
    wp_junction = seg_junction[net.wp_seg]
    wp_conn, junction_conflict = _connector_tables(net)

    # camera head positions: across the junction on each approach's axis
    # (see the MapData field comment). Forward distance = twice the
    # stop-line -> junction-center projection (the far edge) + 2 m.
    stop_pos = net.light_stop_pos.astype(np.float32)
    stop_yaw = net.light_stop_yaw.astype(np.float32)
    dirv = np.stack([np.cos(stop_yaw), np.sin(stop_yaw)], -1)
    leftv = np.stack([-np.sin(stop_yaw), np.cos(stop_yaw)], -1)
    n_j = len(net.junction_n_phases)
    jcenter = np.zeros((n_j, 2), np.float32)
    for j in range(n_j):
        pts = net.wp_pos[wp_junction == j]
        jcenter[j] = pts.mean(0) if len(pts) else 0.0
    proj = np.maximum(np.einsum(
        'ld,ld->l', jcenter[net.light_junction] - stop_pos, dirv), 3.0)
    light_draw = stop_pos + (2.0 * proj + 2.0)[:, None] * dirv \
        + 1.0 * leftv
    ws_pts, ws_comp, ws_nbrs, ws_cross = _walker_spawn_points(
        road, walkable, net.world_offset, net.pixels_per_meter)

    return MapData(
        road_raster=road,
        lane_raster=lane,
        walkable_raster=walkable,
        nav_raster=_pack_nav_raster(walkable, road),
        world_offset=net.world_offset.astype(np.float32),
        wp_pos=net.wp_pos.astype(np.float32),
        wp_yaw=net.wp_yaw.astype(np.float32),
        wp_next=net.wp_next,
        wp_n_next=net.wp_n_next,
        wp_seg=net.wp_seg,
        wp_is_junction=wp_is_junction,
        wp_junction=wp_junction,
        wp_conn=wp_conn,
        junction_conflict=junction_conflict,
        grid_idx=grid,
        spawn_pos=net.spawn_pos.astype(np.float32),
        spawn_yaw=net.spawn_yaw.astype(np.float32),
        light_pole_pos=net.light_poles.astype(np.float32),
        light_draw_pos=light_draw.astype(np.float32),
        light_stop_pos=net.light_stop_pos.astype(np.float32),
        light_stop_yaw=net.light_stop_yaw.astype(np.float32),
        light_junction=net.light_junction,
        light_phase=net.light_phase,
        junction_n_phases=net.junction_n_phases,
        junction_green_s=np.full(len(net.junction_n_phases), 10.0,
                                 np.float32),
        junction_yellow_s=np.full(len(net.junction_n_phases), 3.0,
                                  np.float32),
        walker_spawn=ws_pts,
        walker_spawn_component=ws_comp,
        walker_neighbors=ws_nbrs,
        walker_cross_neighbors=ws_cross,
        road_capsules=net.road_capsules,
        lane_dashes=net.lane_dashes,
    )


def nearest_waypoint_np(map_data: MapData, pos):
    """Host-side nearest-waypoint via the hash grid (device version lives in
    engine.routing)."""
    cell = np.floor((np.asarray(pos) - map_data.world_offset) / GRID_CELL)
    gh, gw = map_data.grid_idx.shape
    cx = int(np.clip(cell[0], 0, gw - 1))
    cy = int(np.clip(cell[1], 0, gh - 1))
    return int(map_data.grid_idx[cy, cx])
