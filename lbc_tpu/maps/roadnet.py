"""Host-side road network: vector town JSON -> lane-level geometry.

Replaces the CARLA server's map API that the reference consumes
(get_waypoint / get_topology / generate_waypoints / get_spawn_points,
global_route_planner_dao.py:26-69) with an offline-computed lane graph:

* every two-way road edge becomes two directed lanes offset half a lane
  width from the centerline (right-hand traffic in CARLA's x-east/y-south
  frame: right = (-t_y, t_x) for tangent t);
* junction connectors are tangent-aligned cubic Beziers between trimmed
  lane ends, classified LEFT/RIGHT/STRAIGHT by tangent cross product
  (global_route_planner.py:263-322 equivalent);
* the reference's zero-cost lane-change edges
  (global_route_planner.py:169-210) are subsumed by construction: parallel
  same-direction lanes share their junction nodes, and _connect_junctions
  creates a connector for EVERY (incoming, outgoing) lane pair, so Dijkstra
  can enter/leave any parallel lane at each junction (multi-lane routing is
  covered without mid-segment jumps — tests/test_maps.py
  test_parallel_lanes_routable);
* a dense ~1 m waypoint lattice with successor indices feeds NPC roaming
  and nearest-waypoint queries on device;
* Dijkstra over the lane-segment graph plans routes at
  ROUTE_RESOLUTION = 2.5 m with RoadOption commands
  (goal_suite.py:49, local_planner.py:291-339 equivalents).

Everything here runs on host at load/reset time; the engine consumes only
the packed arrays from map_data.build_map_data.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from ..constants import (CMD_FOLLOW, CMD_LEFT, CMD_RIGHT, CMD_STRAIGHT,
                         ROUTE_RESOLUTION)

ASSETS = Path(__file__).parent / 'assets'
LATTICE_SPACING = 1.0       # m between lattice waypoints
JUNCTION_TRIM = 8.0         # m trimmed off each road end at a junction
SPAWN_SPACING = 23.0        # m between generated spawn points
STRAIGHT_DEG = 20.0         # |turn angle| below which a connector is STRAIGHT


def resample_polyline(points: np.ndarray, spacing: float) -> np.ndarray:
    """Resample a polyline at uniform arc-length spacing (incl. both ends)."""
    pts = np.asarray(points, np.float64)
    seg = np.hypot(*np.diff(pts, axis=0).T)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    n = max(2, int(round(total / spacing)) + 1)
    si = np.linspace(0.0, total, n)
    x = np.interp(si, s, pts[:, 0])
    y = np.interp(si, s, pts[:, 1])
    return np.stack([x, y], axis=1)


def polyline_length(points: np.ndarray) -> float:
    pts = np.asarray(points, np.float64)
    return float(np.sum(np.hypot(*np.diff(pts, axis=0).T)))


def tangents_of(points: np.ndarray) -> np.ndarray:
    pts = np.asarray(points, np.float64)
    d = np.gradient(pts, axis=0)
    n = np.hypot(d[:, 0], d[:, 1])
    return d / np.maximum(n, 1e-9)[:, None]


def offset_polyline(points: np.ndarray, offset: float) -> np.ndarray:
    """Offset to the right of travel direction by `offset` meters."""
    t = tangents_of(points)
    right = np.stack([-t[:, 1], t[:, 0]], axis=1)
    return np.asarray(points, np.float64) + offset * right


def trim_polyline(points: np.ndarray, trim_start: float,
                  trim_end: float) -> np.ndarray:
    pts = resample_polyline(points, 0.5)
    seg = np.hypot(*np.diff(pts, axis=0).T)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    a = min(trim_start, total * 0.4)
    b = max(total - trim_end, total * 0.6)
    keep = (s >= a) & (s <= b)
    if keep.sum() < 2:
        mid = len(pts) // 2
        keep[:] = False
        keep[max(0, mid - 1): mid + 1] = True
    return pts[keep]


def rdp(points: np.ndarray, eps: float) -> np.ndarray:
    """Ramer-Douglas-Peucker polyline simplification (meters)."""
    pts = np.asarray(points, np.float64)
    if len(pts) < 3:
        return pts
    start, end = pts[0], pts[-1]
    d = end - start
    norm = np.hypot(*d)
    if norm < 1e-9:
        dist = np.hypot(*(pts - start).T)
    else:
        dist = np.abs(d[0] * (pts[:, 1] - start[1])
                      - d[1] * (pts[:, 0] - start[0])) / norm
    idx = int(np.argmax(dist))
    if dist[idx] > eps:
        left = rdp(pts[:idx + 1], eps)
        right = rdp(pts[idx:], eps)
        return np.vstack([left[:-1], right])
    return np.array([start, end])


def bezier(p0, p1, p2, p3, n):
    t = np.linspace(0.0, 1.0, n)[:, None]
    return ((1 - t) ** 3 * p0 + 3 * (1 - t) ** 2 * t * p1
            + 3 * (1 - t) * t ** 2 * p2 + t ** 3 * p3)


@dataclass
class LaneSegment:
    """One directed drivable segment (half of a road, or a connector)."""
    seg_id: int
    road_id: int              # source edge id; connectors get fresh ids
    points: np.ndarray        # (M, 2) at LATTICE_SPACING
    is_junction: bool
    command: int              # CMD_* a route takes through this segment
    start_node: int           # junction node ids (graph endpoints)
    end_node: int
    successors: List[int] = field(default_factory=list)

    @property
    def length(self) -> float:
        return polyline_length(self.points)


class RoadNetwork:
    def __init__(self, town: str):
        data = json.loads((ASSETS / f'{town.lower()}.json').read_text())
        self.name = data['name']
        self.world_offset = np.array(data['world_offset'], np.float64)
        self.pixels_per_meter = float(data['pixels_per_meter'])
        self.mask_shape = tuple(data['mask_shape'])
        self.lane_width = float(data['lane_width_m'])
        self.nodes = np.array(data['nodes'], np.float64)
        self.raw_edges = data['edges']
        self.light_poles = np.array(data['lights'], np.float64)

        self.segments: List[LaneSegment] = []
        self._build_lanes()
        self._connect_junctions()
        self._index_successors()
        self._build_lattice()
        self._build_spawn_points()
        self._assign_lights()
        self._build_capsules()

    # ------------------------------------------------------------------ lanes
    def _build_lanes(self):
        half = self.lane_width / 2.0
        sid = 0
        # map: (edge_id, direction) -> seg_id, for junction wiring
        self.lane_of_edge: Dict[Tuple[int, int], int] = {}
        for eid, edge in enumerate(self.raw_edges):
            pts = np.array(edge['points'], np.float64)
            trimmed = trim_polyline(pts, JUNCTION_TRIM, JUNCTION_TRIM)
            a, b = edge['nodes']
            for direction in (1, -1):
                center = trimmed if direction == 1 else trimmed[::-1]
                lane = offset_polyline(center, half)
                lane = resample_polyline(lane, LATTICE_SPACING)
                start, end = (a, b) if direction == 1 else (b, a)
                self.segments.append(LaneSegment(
                    seg_id=sid, road_id=eid, points=lane,
                    is_junction=False, command=CMD_FOLLOW,
                    start_node=start, end_node=end))
                self.lane_of_edge[(eid, direction)] = sid
                sid += 1

    def _connect_junctions(self):
        sid = len(self.segments)
        next_road_id = len(self.raw_edges)
        incoming: Dict[int, List[LaneSegment]] = {}
        outgoing: Dict[int, List[LaneSegment]] = {}
        for seg in self.segments:
            incoming.setdefault(seg.end_node, []).append(seg)
            outgoing.setdefault(seg.start_node, []).append(seg)

        self.connectors: List[LaneSegment] = []
        for node in range(len(self.nodes)):
            for seg_in in incoming.get(node, []):
                for seg_out in outgoing.get(node, []):
                    if seg_out.road_id == seg_in.road_id:
                        continue  # no U-turns back onto the same road
                    p0 = seg_in.points[-1]
                    p3 = seg_out.points[0]
                    t_in = seg_in.points[-1] - seg_in.points[-2]
                    t_in /= np.hypot(*t_in)
                    t_out = seg_out.points[1] - seg_out.points[0]
                    t_out /= np.hypot(*t_out)
                    gap = np.hypot(*(p3 - p0))
                    k = max(gap / 3.0, 1.0)
                    curve = bezier(p0, p0 + k * t_in, p3 - k * t_out, p3,
                                   max(4, int(gap)))
                    curve = resample_polyline(curve, LATTICE_SPACING)

                    cross = t_in[0] * t_out[1] - t_in[1] * t_out[0]
                    dot = float(np.clip(np.dot(t_in, t_out), -1, 1))
                    ang = np.degrees(np.arccos(dot))
                    if ang < STRAIGHT_DEG:
                        cmd = CMD_STRAIGHT
                    elif cross > 0:
                        cmd = CMD_RIGHT
                    else:
                        cmd = CMD_LEFT

                    conn = LaneSegment(
                        seg_id=sid, road_id=next_road_id, points=curve,
                        is_junction=True, command=cmd,
                        start_node=node, end_node=node)
                    conn._from = seg_in.seg_id     # type: ignore
                    conn._to = seg_out.seg_id      # type: ignore
                    self.connectors.append(conn)
                    self.segments.append(conn)
                    sid += 1
                    next_road_id += 1

    def _index_successors(self):
        for conn in self.connectors:
            self.segments[conn._from].successors.append(conn.seg_id)
            conn.successors.append(conn._to)

    # ---------------------------------------------------------------- lattice
    def _build_lattice(self):
        pos, yaw, seg_of, idx_in_seg = [], [], [], []
        self.seg_first: List[int] = []
        for seg in self.segments:
            t = tangents_of(seg.points)
            self.seg_first.append(len(pos))
            for i, p in enumerate(seg.points):
                pos.append(p)
                yaw.append(np.arctan2(t[i, 1], t[i, 0]))
                seg_of.append(seg.seg_id)
                idx_in_seg.append(i)
        self.wp_pos = np.array(pos)
        self.wp_yaw = np.array(yaw)
        self.wp_seg = np.array(seg_of, np.int32)
        self.wp_idx_in_seg = np.array(idx_in_seg, np.int32)

        n = len(self.wp_pos)
        self.wp_next = np.full((n, 3), -1, np.int32)
        self.wp_n_next = np.zeros(n, np.int32)
        for seg in self.segments:
            first = self.seg_first[seg.seg_id]
            m = len(seg.points)
            for i in range(m - 1):
                self.wp_next[first + i, 0] = first + i + 1
                self.wp_n_next[first + i] = 1
            last = first + m - 1
            succ = [self.seg_first[s] for s in seg.successors][:3]
            for j, s in enumerate(succ):
                self.wp_next[last, j] = s
            self.wp_n_next[last] = len(succ)
            if not succ:  # safety: loop back onto itself (shouldn't happen)
                self.wp_next[last, 0] = last
                self.wp_n_next[last] = 1

        from scipy.spatial import cKDTree
        self._kdtree = cKDTree(self.wp_pos)
        # per-direction trees for "waypoint on my lane" queries
        self._seg_is_junction = np.array(
            [s.is_junction for s in self.segments])

    def nearest_waypoint(self, pos, yaw=None) -> int:
        """Nearest lattice waypoint; with `yaw`, nearest whose lane heading
        is within 90 degrees (avoids snapping onto the opposite lane)."""
        if yaw is None:
            return int(self._kdtree.query(np.asarray(pos, np.float64))[1])
        d, idx = self._kdtree.query(np.asarray(pos, np.float64), k=12)
        for i in np.atleast_1d(idx):
            dyaw = np.abs(np.mod(self.wp_yaw[i] - yaw + np.pi,
                                 2 * np.pi) - np.pi)
            if dyaw < np.pi / 2:
                return int(i)
        return int(np.atleast_1d(idx)[0])

    # ----------------------------------------------------------- spawn points
    def _build_spawn_points(self):
        pts, yaws = [], []
        for seg in self.segments:
            if seg.is_junction:
                continue
            t = tangents_of(seg.points)
            s = 0.0
            length = seg.length
            k = SPAWN_SPACING / 2.0
            while k < length - 5.0:
                i = int(round(k / LATTICE_SPACING))
                i = min(i, len(seg.points) - 1)
                pts.append(seg.points[i])
                yaws.append(np.arctan2(t[i, 1], t[i, 0]))
                k += SPAWN_SPACING
        self.spawn_pos = np.array(pts)
        self.spawn_yaw = np.array(yaws)

    # ----------------------------------------------------------------- lights
    def _assign_lights(self):
        """Attach each light pole to the incoming lane it governs.

        CARLA places the European-style pole near the stop line of its
        approach (agent.py:95-131 checks same road/lane within 10 m, 60
        degrees). We bind each pole to the non-junction lane whose *end
        point* (= junction entry) is nearest, and phase-group lights per
        junction by opposing approach: ~parallel (mod 180 deg) headings
        share a green phase, the perpendicular group gets the other (see
        the phase-index block below — this correlation is what makes the
        far-side head a learnable cue for the image agent).
        """
        ends = []
        for seg in self.segments:
            if seg.is_junction:
                continue
            ends.append((seg.seg_id, seg.points[-1], seg.end_node))

        self.light_seg = []
        self.light_stop_pos = []
        self.light_stop_yaw = []
        self.light_junction = []
        for pole in self.light_poles:
            best, bd = None, 1e9
            for seg_id, end, node in ends:
                d = np.hypot(*(end - pole))
                if d < bd:
                    bd, best = d, (seg_id, end, node)
            seg_id, end, node = best
            seg = self.segments[seg_id]
            t = seg.points[-1] - seg.points[-2]
            self.light_seg.append(seg_id)
            self.light_stop_pos.append(end)
            self.light_stop_yaw.append(np.arctan2(t[1], t[0]))
            self.light_junction.append(node)

        self.light_seg = np.array(self.light_seg, np.int32)
        self.light_stop_pos = np.array(self.light_stop_pos)
        self.light_stop_yaw = np.array(self.light_stop_yaw)
        self.light_junction = np.array(self.light_junction, np.int32)
        # phase index: CARLA-style opposing-approach grouping. Lights whose
        # approach headings are ~parallel (mod 180 deg) share a phase and
        # turn green TOGETHER; the perpendicular group gets the other
        # phase. This is what makes the far-side light head (the only one
        # inside the ego camera's FOV at the stop line) carry the ego's
        # own light state — the visual cue the reference image agent
        # learns to stop/go on. Round-robin per-light phases (round 1-2)
        # broke that correlation and made "when to go" visually
        # unlearnable: the stage-1 agent deadlocked at the first red.
        self.light_phase = np.zeros(len(self.light_poles), np.int32)
        self.junction_n_phases = np.zeros(len(self.nodes), np.int32)
        for node in np.unique(self.light_junction):
            ids = np.nonzero(self.light_junction == node)[0]
            base = self.light_stop_yaw[ids[0]]
            for i in ids:
                diff = self.light_stop_yaw[i] - base
                # absolute angular difference folded mod 180 deg
                diff = abs((diff + np.pi / 2) % np.pi - np.pi / 2)
                self.light_phase[i] = 0 if diff < np.pi / 4 else 1
            # always >= 2 phases so every light cycles through red
            self.junction_n_phases[node] = 2

    # --------------------------------------------------------------- capsules
    def _build_capsules(self):
        """Roads as capsule segments for gather-free analytic rendering.

        TPU rasters are memory-bound (random gathers); instead each road
        edge centerline becomes straight sub-segments with a half-width,
        and renderers evaluate point-to-segment distance on the VPU. The
        dash phase for lane markings is the arclength at each sub-segment
        start (3 m on / 3 m off divider).
        """
        caps = []      # x0, y0, x1, y1, half_width
        dashes = []    # x0, y0, x1, y1, s0, seg_len
        for edge in self.raw_edges:
            pts = rdp(np.asarray(edge['points'], np.float64), eps=0.15)
            hw = float(edge.get('half_width_m', self.lane_width))
            s = 0.0
            for a, b in zip(pts[:-1], pts[1:]):
                seg_len = float(np.hypot(*(b - a)))
                if seg_len < 1e-3:
                    continue
                caps.append([a[0], a[1], b[0], b[1], hw])
                dashes.append([a[0], a[1], b[0], b[1], s, seg_len])
                s += seg_len
        self.road_capsules = np.array(caps, np.float32)
        self.lane_dashes = np.array(dashes, np.float32)

    # ---------------------------------------------------------------- routing
    def plan_route(self, start_pos, target_pos,
                   resolution: float = ROUTE_RESOLUTION,
                   start_yaw=None):
        """A point-to-point route: list of (x, y, command) at 2.5 m.

        Equivalent of GlobalRoutePlanner.trace_route + LocalPlannerNew
        route layout (local_planner.py:314-339): Dijkstra over lane
        segments, then uniform resampling with per-node RoadOption.
        """
        import heapq
        start_wp = self.nearest_waypoint(start_pos, yaw=start_yaw)
        target_wp = self.nearest_waypoint(target_pos)
        start_seg = int(self.wp_seg[start_wp])
        target_seg = int(self.wp_seg[target_wp])
        lo = int(self.wp_idx_in_seg[start_wp])
        hi = int(self.wp_idx_in_seg[target_wp]) + 1

        if start_seg == target_seg and hi > lo:
            chain = [start_seg]           # straight down one segment
        else:
            # Dijkstra seeded at start_seg's successors so a route may loop
            # back onto start_seg (target behind us on the same lane).
            dist: Dict[int, float] = {}
            prev: Dict[int, int] = {}
            pq = []
            for nxt in self.segments[start_seg].successors:
                c = self.segments[nxt].length
                if c < dist.get(nxt, np.inf):
                    dist[nxt] = c
                    prev[nxt] = -1
                    heapq.heappush(pq, (c, nxt))
            while pq:
                d, s = heapq.heappop(pq)
                if d > dist.get(s, np.inf):
                    continue
                if s == target_seg:
                    break
                for nxt in self.segments[s].successors:
                    nd = d + self.segments[nxt].length
                    if nd < dist.get(nxt, np.inf):
                        dist[nxt] = nd
                        prev[nxt] = s
                        heapq.heappush(pq, (nd, nxt))
            if target_seg not in dist:
                raise ValueError('no route found')
            chain = [target_seg]
            while prev[chain[-1]] != -1:
                chain.append(prev[chain[-1]])
            chain.append(start_seg)
            chain.reverse()

        # Concatenate lattice points: start at ego's waypoint, end at the
        # target's waypoint.
        pts, cmds = [], []
        for k, s in enumerate(chain):
            seg = self.segments[s]
            p = seg.points
            a = lo if k == 0 else 0
            b = hi if k == len(chain) - 1 else len(p)
            if k == 0 and len(chain) > 1:
                b = len(p)
            p = p[a:b]
            pts.extend(p)
            cmds.extend([seg.command] * len(p))
        pts = np.array(pts)
        cmds = np.array(cmds, np.int32)
        if len(pts) < 2:
            pts = np.vstack([pts, pts[-1] + 0.1])
            cmds = np.array([CMD_FOLLOW, CMD_FOLLOW], np.int32)

        # resample at ROUTE_RESOLUTION, carrying the command of the nearest
        # original node
        seg_len = np.hypot(*np.diff(pts, axis=0).T)
        s = np.concatenate([[0.0], np.cumsum(seg_len)])
        total = s[-1]
        n = max(2, int(total / ROUTE_RESOLUTION) + 1)
        si = np.linspace(0.0, total, n)
        x = np.interp(si, s, pts[:, 0])
        y = np.interp(si, s, pts[:, 1])
        idx = np.searchsorted(s, si, side='left')
        idx = np.clip(idx, 0, len(cmds) - 1)
        route_cmd = cmds[idx]
        return np.stack([x, y], axis=1), route_cmd


_CACHE: Dict[str, RoadNetwork] = {}


def get_roadnet(town: str) -> RoadNetwork:
    key = town.lower()
    if key not in _CACHE:
        _CACHE[key] = RoadNetwork(town)
    return _CACHE[key]
