"""Analytic capsule geometry vs the rasterized golden reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.maps import build_map_data, get_roadnet
from lbc_tpu.render.geometry import (road_lane_channels, select_capsules)
from lbc_tpu.render.bev import pixel_world_coords


@pytest.fixture(scope='module')
def md():
    return build_map_data('Town01')


def test_capsule_counts(md):
    m = md.road_capsules.shape[0]
    assert 30 < m < 2000
    assert md.lane_dashes.shape == (m, 6)


@pytest.mark.parametrize('spawn_idx', [5, 60, 120, 200])
def test_analytic_matches_raster(md, spawn_idx):
    """Road membership from capsules agrees with the cv2 raster on a BEV
    window around real spawn points (junctions included)."""
    pos = jnp.asarray(md.spawn_pos[spawn_idx])
    yaw = jnp.asarray(md.spawn_yaw[spawn_idx])
    w = pixel_world_coords(pos, yaw)

    caps, dashes = select_capsules(jnp.asarray(md.road_capsules),
                                   jnp.asarray(md.lane_dashes),
                                   pos + 20.0 * jnp.array(
                                       [jnp.cos(yaw), jnp.sin(yaw)]), 16)
    road, lane = road_lane_channels(w, caps, dashes)
    road = np.asarray(road)

    px = np.round((np.asarray(w) - md.world_offset) * 5).astype(int)
    h, wd = md.road_raster.shape
    ix = np.clip(px[..., 0], 0, wd - 1)
    iy = np.clip(px[..., 1], 0, h - 1)
    raster = md.road_raster[iy, ix] > 0

    agree = (road == raster).mean()
    assert agree > 0.97, f'agreement {agree:.3f}'
    # lane markings: on-road and reasonably present
    lane = np.asarray(lane)
    assert lane.sum() > 20
    assert raster[lane].mean() > 0.95
