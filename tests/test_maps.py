import numpy as np
import pytest

from lbc_tpu.constants import (CMD_FOLLOW, CMD_LEFT, CMD_RIGHT, CMD_STRAIGHT,
                               ROUTE_RESOLUTION)
from lbc_tpu.maps import build_map_data, get_roadnet, nearest_waypoint_np


@pytest.fixture(scope='module')
def net():
    return get_roadnet('Town01')


@pytest.fixture(scope='module')
def md():
    return build_map_data('Town01')


def test_town01_structure(net):
    # CARLA Town01: 12 T-junctions, 36 lights (3 per junction)
    assert len(net.nodes) == 12
    assert len(net.light_poles) == 36
    # two CARLA-style phases per junction: opposing approaches (mod-180
    # headings) share a phase so the far-side head shows the ego's state
    assert all(net.junction_n_phases[np.unique(net.light_junction)] == 2)
    for node in np.unique(net.light_junction):
        ids = np.nonzero(net.light_junction == node)[0]
        for a in ids:
            for b in ids:
                d = abs((net.light_stop_yaw[a] - net.light_stop_yaw[b]
                         + np.pi / 2) % np.pi - np.pi / 2)
                same = net.light_phase[a] == net.light_phase[b]
                assert same == (d < np.pi / 4)
    # every non-junction lane ends in >= 1 successor connector
    for seg in net.segments:
        assert seg.successors or seg.is_junction is False


def test_lattice_successors(net):
    # following successors from any waypoint must stay on the lattice and
    # advance roughly LATTICE_SPACING each step
    idx = 0
    p = net.wp_pos[idx]
    for _ in range(200):
        nxt = net.wp_next[idx, 0]
        assert nxt >= 0
        d = np.hypot(*(net.wp_pos[nxt] - p))
        assert d < 3.0
        idx, p = nxt, net.wp_pos[nxt]


def test_lane_sides(net):
    """Two directed lanes of the same road are offset to opposite sides and
    run antiparallel (right-hand traffic)."""
    a = net.segments[0]
    b = net.segments[1]
    assert a.road_id == b.road_id
    # midpoints should differ by about a lane width
    pa = a.points[len(a.points) // 2]
    pb = b.points[len(b.points) // 2]
    assert 2.0 < np.hypot(*(pa - pb)) < 8.0


def test_route_planning(net):
    start = net.spawn_pos[0]
    target = net.spawn_pos[len(net.spawn_pos) // 2]
    pts, cmds = net.plan_route(start, target)
    assert len(pts) == len(cmds)
    steps = np.hypot(*np.diff(pts, axis=0).T)
    assert np.all(steps < ROUTE_RESOLUTION * 1.5)
    assert np.hypot(*(pts[0] - start)) < 5.0
    assert np.hypot(*(pts[-1] - target)) < 5.0
    assert set(np.unique(cmds)) <= {CMD_FOLLOW, CMD_LEFT, CMD_RIGHT,
                                    CMD_STRAIGHT}


def test_routes_between_many_spawn_pairs(net):
    rng = np.random.RandomState(0)
    n = len(net.spawn_pos)
    for _ in range(10):
        i, j = rng.randint(0, n, 2)
        if i == j:
            continue
        pts, _ = net.plan_route(net.spawn_pos[i], net.spawn_pos[j])
        assert len(pts) >= 2


def test_rasters(md):
    assert md.road_raster.shape == (2492, 2492)
    frac = md.road_raster.mean()
    assert 0.02 < frac < 0.2
    # lane markings lie on the road
    on_road = md.road_raster[md.lane_raster > 0].mean()
    assert on_road > 0.95


def test_nearest_waypoint_grid(md):
    # the nearest waypoint of a lattice point is itself or a close neighbor
    for i in [0, 100, 1000]:
        j = nearest_waypoint_np(md, md.wp_pos[i])
        assert np.hypot(*(md.wp_pos[j] - md.wp_pos[i])) < 2.5


def test_spawn_points(md):
    assert len(md.spawn_pos) > 150     # CARLA Town01 has ~255
    # all spawn points on the road
    px = ((md.spawn_pos - md.world_offset) * 5).astype(int)
    vals = md.road_raster[px[:, 1], px[:, 0]]
    assert vals.mean() > 0.99


def test_lights_near_their_stop_lanes(md):
    d = np.hypot(*(md.light_pole_pos - md.light_stop_pos).T)
    assert np.median(d) < 20.0


def test_parallel_lanes_routable(tmp_path, monkeypatch):
    """Multi-lane coverage (global_route_planner.py:169-210 analog):
    parallel same-direction lanes share junction nodes, so every
    (incoming, outgoing) pair gets a connector and Dijkstra can use
    either lane — the reference's zero-cost lane-change edges are
    subsumed by construction. Synthetic 2-lane town: two parallel edges
    A/B between n0-n1, one exit edge n1-n2."""
    import json

    import lbc_tpu.maps.roadnet as R

    town = {
        'name': 'twolane',
        'world_offset': [0.0, 0.0],
        'pixels_per_meter': 5.0,
        'mask_shape': [1200, 1200],
        'lane_width_m': 5.0,
        'nodes': [[20.0, 100.0], [140.0, 100.0], [140.0, 220.0]],
        'edges': [
            {'nodes': [0, 1], 'half_width_m': 5.0,
             'points': [[20.0, 100.0], [140.0, 100.0]]},
            {'nodes': [0, 1], 'half_width_m': 5.0,    # parallel lane pair
             'points': [[20.0, 107.0], [140.0, 107.0]]},
            {'nodes': [1, 2], 'half_width_m': 5.0,
             'points': [[140.0, 100.0], [140.0, 220.0]]},
        ],
        'lights': [],
    }
    (tmp_path / 'twolane.json').write_text(json.dumps(town))
    monkeypatch.setattr(R, 'ASSETS', tmp_path)
    net = R.RoadNetwork('twolane')

    # both parallel forward lanes end at n1 and can reach the exit edge
    fwd = [s for s in net.segments
           if not s.is_junction and s.start_node == 0 and s.end_node == 1]
    assert len(fwd) == 2
    for lane in fwd:
        assert lane.successors, 'parallel lane dead-ends at junction'

    # a route from EITHER parallel lane reaches the target past n1
    target = np.array([137.5, 200.0])
    for lane in fwd:
        start = lane.points[2]
        t = lane.points[3] - lane.points[2]
        yaw = float(np.arctan2(t[1], t[0]))
        pts, cmds = net.plan_route(start, target, start_yaw=yaw)
        assert np.hypot(*(pts[-1] - target)) < 6.0
        assert len(pts) > 10


def test_connector_conflict_tables(net, md):
    """Junction connector labeling + conflict bitmasks
    (maps/map_data.py:_connector_tables): every junction waypoint carries
    a local connector index, masks are symmetric with no self-conflict,
    same-entry (diverging) pairs never conflict, and a left turn
    conflicts with the oncoming straight it crosses."""
    wpj = np.asarray(md.wp_junction)
    wpc = np.asarray(md.wp_conn)
    conf = np.asarray(md.junction_conflict)

    # labeling: junction wps have a connector, road wps have -1
    assert ((wpc >= 0) == (wpj >= 0)).all()

    by_junction = {}
    for s in net.segments:
        if s.is_junction:
            by_junction.setdefault(s.start_node, []).append(s)

    from lbc_tpu.constants import CMD_LEFT, CMD_STRAIGHT
    saw_left_cross = False
    for node, conns in by_junction.items():
        n = len(conns)
        for a in range(n):
            # wp_conn of this segment's waypoints matches its local index
            seg_wps = np.nonzero(np.asarray(md.wp_seg)
                                 == conns[a].seg_id)[0]
            assert (wpc[seg_wps] == a).all()
            # no self-conflict
            assert not (conf[node, a] >> a) & 1
            for b in range(a + 1, n):
                bit_ab = (conf[node, a] >> b) & 1
                bit_ba = (conf[node, b] >> a) & 1
                assert bit_ab == bit_ba          # symmetry
                if conns[a]._from == conns[b]._from:
                    assert not bit_ab            # diverging: no conflict
                if bit_ab and {conns[a].command, conns[b].command} == \
                        {CMD_LEFT, CMD_STRAIGHT}:
                    saw_left_cross = True
    assert saw_left_cross, 'no left-vs-straight crossing flagged'


def test_intended_connector_matches_route():
    """engine.routing.intended_connector recovers the junction + a
    connector mask containing the planned connector for a route that
    turns through a junction."""
    import jax.numpy as jnp

    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.engine.routing import intended_connector

    env = DrivingEnv(EnvConfig(town='Town01'))
    st = env.reset_np(seed=0, start=4, target=27)
    md = env.map_data
    wpj = np.asarray(md.wp_junction)
    wpc = np.asarray(md.wp_conn)

    # walk the route to a point ~6 m before its first junction waypoint
    route_pts = np.asarray(st.route.pos)
    wps = [nearest_waypoint_np(env.map_np, p) for p in route_pts]
    j_at = [k for k, w in enumerate(wps) if wpj[w] >= 0]
    assert j_at, 'route never crosses a junction'
    k0 = j_at[0]
    true_j = int(wpj[wps[k0]])
    true_c = int(wpc[wps[k0]])

    route = st.route._replace(next_idx=jnp.asarray(max(k0 - 2, 0),
                                                   jnp.int32))
    ego_pos = jnp.asarray(route_pts[max(k0 - 2, 0)], jnp.float32)
    j, cmask, dist = intended_connector(env.map_data, route, ego_pos)
    assert int(j) == true_j
    assert (int(cmask) >> true_c) & 1
    assert float(dist) < 10.0
