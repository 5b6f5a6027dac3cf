"""Packed nav raster: the walker-path gather optimization contract.

engine/walkers.py answers its walkable / road-entry / on-road queries
from ONE uint32 gather into map_data.nav_raster (3x3-neighborhood bit
pack, maps/map_data.py:_pack_nav_raster) instead of per-candidate raster
gathers — the round-3 throughput regression. These tests pin:

1. bit-level equivalence of the packed lookup against direct raster
   indexing for every (center, candidate) pair a walker can produce;
2. the <1 px/tick movement invariant the neighborhood trick relies on
   (walker speed is 1 + U(0,1) m/s, DT = 0.1 s, 5 px/m).
"""
import numpy as np

from lbc_tpu.constants import DT, PIXELS_PER_METER
from lbc_tpu.maps.map_data import _pack_nav_raster, build_map_data

MAX_WALKER_SPEED = 2.0  # engine/env.py: speed = 1 + U(0,1) < 2


def test_walker_step_stays_within_one_pixel():
    assert MAX_WALKER_SPEED * DT * PIXELS_PER_METER <= 1.0


def test_pack_nav_raster_bits():
    rng = np.random.RandomState(0)
    walk = (rng.rand(37, 23) < 0.5).astype(np.uint8)
    road = (rng.rand(37, 23) < 0.3).astype(np.uint8)
    nav = _pack_nav_raster(walk, road)
    h, w = walk.shape
    for y, x in [(0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1), (5, 7),
                 (18, 11), (36, 22)]:
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                b = (dy + 1) * 3 + (dx + 1)
                yy, xx = np.clip(y + dy, 0, h - 1), np.clip(x + dx, 0, w - 1)
                assert (nav[y, x] >> b) & 1 == walk[yy, xx]
                assert (nav[y, x] >> (9 + b)) & 1 == road[yy, xx]


def test_packed_lookup_matches_direct_gathers_on_town01():
    """End-to-end equivalence on real map data: candidate positions built
    exactly like walker_step builds them, old-style direct raster gathers
    vs the packed-nav bit path."""
    md = build_map_data('Town01')
    h, w = md.walkable_raster.shape

    rng = np.random.RandomState(1)
    P = 1024
    lo = md.world_offset - 5.0
    hi = md.world_offset + np.array([w, h]) / PIXELS_PER_METER + 5.0
    pos = rng.uniform(lo, hi, size=(P, 2)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, size=(P,))
    speed = (1.0 + rng.rand(P)).astype(np.float32)

    angles = np.array([0.0, 0.7854, -0.7854, 1.5708, -1.5708])
    dirn = np.stack([np.cos(ang), np.sin(ang)], -1)
    ca, sa = np.cos(angles), np.sin(angles)
    cand_dir = np.stack([dirn[:, None, 0] * ca - dirn[:, None, 1] * sa,
                         dirn[:, None, 0] * sa + dirn[:, None, 1] * ca], -1)
    cand = pos[:, None, :] + cand_dir * (speed * DT)[:, None, None]

    px = np.round((cand - md.world_offset) * PIXELS_PER_METER)
    cx = np.clip(px[..., 0].astype(np.int32), 0, w - 1)
    cy = np.clip(px[..., 1].astype(np.int32), 0, h - 1)
    cur = np.round((pos - md.world_offset) * PIXELS_PER_METER)
    cx0 = np.clip(cur[:, 0].astype(np.int32), 0, w - 1)
    cy0 = np.clip(cur[:, 1].astype(np.int32), 0, h - 1)

    nav = md.nav_raster[cy0, cx0]
    bit = ((np.clip(cy - cy0[:, None], -1, 1) + 1) * 3
           + (np.clip(cx - cx0[:, None], -1, 1) + 1)).astype(np.uint32)

    assert np.array_equal(((nav[:, None] >> bit) & 1) > 0,
                          md.walkable_raster[cy, cx] > 0)
    assert np.array_equal(((nav[:, None] >> (bit + np.uint32(9))) & 1) > 0,
                          md.road_raster[cy, cx] > 0)
    assert np.array_equal(((nav >> np.uint32(13)) & 1) > 0,
                          md.road_raster[cy0, cx0] > 0)
    assert np.abs(cx - cx0[:, None]).max() <= 1
    assert np.abs(cy - cy0[:, None]).max() <= 1
