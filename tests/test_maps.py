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
    assert all(net.junction_n_phases[np.unique(net.light_junction)] == 3)
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
