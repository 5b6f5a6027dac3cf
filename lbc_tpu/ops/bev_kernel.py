"""Fused Pallas TPU kernel for the 7-channel BEV raster.

One kernel invocation computes every channel of a row-tile directly in
VMEM: world coordinates from the ego transform, capsule road/lane fields,
K-nearest actor box tests and light circles — with zero HBM intermediates
(the pure-XLA path materializes (H, W, K) masks between fusions). Actor/
segment selection (top-k by distance) stays in XLA where it is cheap.

Layout: output is channel-first (B, 8, 320, 320) so the trailing two dims
tile onto (sublane, lane) natively; channel 7 is padding. The wrapper
returns NHWC for the conv stack.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (EGO_EXTENT_X, EGO_EXTENT_Y, EGO_WINDOW_COL,
                         EGO_WINDOW_ROW, LIGHT_DRAW_RADIUS_M, MAP_SIZE,
                         PIXELS_PER_METER_RENDER, WALKER_EXTENT)
from ..render.bev import (K_LIGHTS, K_ROAD_SEGMENTS, K_VEHICLES, K_WALKERS,
                          RASTER_COVERAGE, _select_nearest)
from ..render.geometry import (DASH_ON, DASH_PERIOD, LANE_HALF_WIDTH,
                               select_capsules)

TILE_ROWS = 32
N_TILES = MAP_SIZE // TILE_ROWS
LIGHT_TABLE_ROWS = 16   # K_LIGHTS padded to a sublane multiple


def _bev_kernel(ego_ref, caps_ref, veh_ref, walk_ref, light_ref, out_ref,
                *, row0: int = 0, col0: int = 0, width: int = MAP_SIZE):
    """Row-tile kernel. Refs (leading env-block dim of 1 dropped by
    indexing):
      ego:   (1, 8)  [x, y, cos, sin, ...pad]
      caps:  (1, K_R, 8) [x0, y0, x1, y1, hw, s0, seg_len, pad]
      veh:   (1, K_V, 8) [x, y, cos, sin, valid, ...]
      walk:  (1, K_W, 8) [x, y, valid, ...]
      light: (1, K_L, 8) [x, y, state, valid, ...]
      out:   (1, 8, TILE_ROWS, width)

    row0/col0 offset the rendered window inside the 320x320 BEV frame —
    the cropped-render path computes only the 192x192 agent crop
    (render_bev_crop_pallas), skipping the ~2.8x wasted pixels of
    render-then-crop.
    """
    tile = pl.program_id(1)

    ego_x = ego_ref[0, 0, 0]
    ego_y = ego_ref[0, 0, 1]
    c = ego_ref[0, 0, 2]
    s = ego_ref[0, 0, 3]

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, width), 0).astype(jnp.float32) \
        + tile.astype(jnp.float32) * TILE_ROWS + float(row0)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, width), 1).astype(jnp.float32) \
        + float(col0)
    fwd_m = (EGO_WINDOW_ROW - rows) / PIXELS_PER_METER_RENDER
    lat_m = (cols - EGO_WINDOW_COL) / PIXELS_PER_METER_RENDER
    # world = ego + fwd_m * (c, s) + lat_m * (-s, c)
    wx = ego_x + fwd_m * c - lat_m * s
    wy = ego_y + fwd_m * s + lat_m * c

    zero = jnp.zeros_like(wx)
    road = zero
    lane = zero
    for k in range(K_ROAD_SEGMENTS):
        x0 = caps_ref[0, k, 0]
        y0 = caps_ref[0, k, 1]
        abx = caps_ref[0, k, 2] - x0
        aby = caps_ref[0, k, 3] - y0
        hw = caps_ref[0, k, 4]
        s0 = caps_ref[0, k, 5]
        seg_len = caps_ref[0, k, 6]
        denom = jnp.maximum(abx * abx + aby * aby, 1e-9)
        t = jnp.clip(((wx - x0) * abx + (wy - y0) * aby) / denom, 0., 1.)
        dx = wx - (x0 + t * abx)
        dy = wy - (y0 + t * aby)
        d2 = dx * dx + dy * dy
        road = jnp.maximum(road, (d2 <= hw * hw).astype(jnp.float32))
        arclen = s0 + t * seg_len
        dash_on = jnp.mod(arclen, DASH_PERIOD) < DASH_ON
        hit = (d2 <= LANE_HALF_WIDTH * LANE_HALF_WIDTH) & dash_on
        lane = jnp.maximum(lane, hit.astype(jnp.float32))

    vehicle = zero
    ex = EGO_EXTENT_X + RASTER_COVERAGE
    ey = EGO_EXTENT_Y + RASTER_COVERAGE
    for k in range(K_VEHICLES):
        vx = veh_ref[0, k, 0]
        vy = veh_ref[0, k, 1]
        vc = veh_ref[0, k, 2]
        vs = veh_ref[0, k, 3]
        valid = veh_ref[0, k, 4]
        rx = wx - vx
        ry = wy - vy
        along = rx * vc + ry * vs
        lat = -rx * vs + ry * vc
        inside = (jnp.abs(along) <= ex) & (jnp.abs(lat) <= ey)
        vehicle = jnp.maximum(vehicle,
                              inside.astype(jnp.float32) * valid)

    walker = zero
    we = WALKER_EXTENT + RASTER_COVERAGE
    for k in range(K_WALKERS):
        pxw = walk_ref[0, k, 0]
        pyw = walk_ref[0, k, 1]
        valid = walk_ref[0, k, 2]
        inside = (jnp.abs(wx - pxw) <= we) & (jnp.abs(wy - pyw) <= we)
        walker = jnp.maximum(walker, inside.astype(jnp.float32) * valid)

    red = zero
    yellow = zero
    green = zero
    r2 = LIGHT_DRAW_RADIUS_M * LIGHT_DRAW_RADIUS_M
    for k in range(K_LIGHTS):
        lx = light_ref[0, k, 0]
        ly = light_ref[0, k, 1]
        st = light_ref[0, k, 2]
        valid = light_ref[0, k, 3]
        dx = wx - lx
        dy = wy - ly
        hit = ((dx * dx + dy * dy) <= r2).astype(jnp.float32) * valid
        red = jnp.maximum(red, hit * (st == 2.0))
        yellow = jnp.maximum(yellow, hit * (st == 1.0))
        green = jnp.maximum(green, hit * (st == 0.0))

    out_ref[0, 0] = road
    out_ref[0, 1] = lane
    out_ref[0, 2] = red
    out_ref[0, 3] = yellow
    out_ref[0, 4] = green
    out_ref[0, 5] = vehicle
    out_ref[0, 6] = walker
    out_ref[0, 7] = zero


def _pack_params(map_data, ego_pos, ego_yaw, npc_pos, npc_yaw, npc_active,
                 walker_pos, walker_active, light_state):
    """XLA-side per-env selection + packing into small VMEM tables."""
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    ego = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(ego_pos[0]) \
        .at[0, 1].set(ego_pos[1]).at[0, 2].set(fwd[0]) \
        .at[0, 3].set(fwd[1])

    center = ego_pos + 20.0 * fwd
    caps_sel, dash_sel = select_capsules(
        map_data.road_capsules, map_data.lane_dashes, center,
        K_ROAD_SEGMENTS)
    caps = jnp.zeros((K_ROAD_SEGMENTS, 8), jnp.float32)
    caps = caps.at[:, 0:5].set(caps_sel[:, 0:5])
    caps = caps.at[:, 5].set(dash_sel[:, 4])
    caps = caps.at[:, 6].set(dash_sel[:, 5])

    vi, vv = _select_nearest(npc_pos, npc_active, ego_pos, K_VEHICLES)
    kv = vi.shape[0]            # may be < K_VEHICLES when few actors exist
    veh = jnp.zeros((K_VEHICLES, 8), jnp.float32)
    veh = veh.at[:kv, 0:2].set(npc_pos[vi])
    veh = veh.at[:kv, 2].set(jnp.cos(npc_yaw[vi]))
    veh = veh.at[:kv, 3].set(jnp.sin(npc_yaw[vi]))
    veh = veh.at[:kv, 4].set(vv.astype(jnp.float32))

    wi, wv = _select_nearest(walker_pos, walker_active, ego_pos, K_WALKERS)
    kw = wi.shape[0]
    walk = jnp.zeros((K_WALKERS, 8), jnp.float32)
    walk = walk.at[:kw, 0:2].set(walker_pos[wi])
    walk = walk.at[:kw, 2].set(wv.astype(jnp.float32))

    light_pos = map_data.light_pole_pos
    li, lv = _select_nearest(light_pos,
                             jnp.ones(light_pos.shape[0], bool), ego_pos,
                             K_LIGHTS)
    kl = li.shape[0]
    lig = jnp.zeros((LIGHT_TABLE_ROWS, 8), jnp.float32)
    lig = lig.at[:kl, 0:2].set(light_pos[li])
    lig = lig.at[:kl, 2].set(light_state[li].astype(jnp.float32))
    lig = lig.at[:kl, 3].set(lv.astype(jnp.float32))
    return ego, caps, veh, walk, lig


def _call_bev_kernel(ego, caps, veh, walk, lig, height, width, row0, col0,
                     interpret):
    b = ego.shape[0]
    kernel = partial(_bev_kernel, row0=row0, col0=col0, width=width)
    out = pl.pallas_call(
        kernel,
        grid=(b, height // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_ROAD_SEGMENTS, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_VEHICLES, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_WALKERS, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LIGHT_TABLE_ROWS, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_ROWS, width),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, height, width),
                                       jnp.float32),
        interpret=interpret,
    )(ego, caps, veh, walk, lig)
    return jnp.transpose(out[:, :7], (0, 2, 3, 1))


def render_bev_pallas(map_data, ego_pos, ego_yaw, npc_pos, npc_yaw,
                      npc_active, walker_pos, walker_active,
                      light_state, interpret: bool = False):
    """Batched fused BEV: all leading args batched (B, ...); light poles
    come from map_data, light_state is (B, L). Returns
    (B, 320, 320, 7) float32."""
    pack = jax.vmap(partial(_pack_params, map_data))
    ego, caps, veh, walk, lig = pack(ego_pos, ego_yaw, npc_pos, npc_yaw,
                                     npc_active, walker_pos, walker_active,
                                     light_state)
    return _call_bev_kernel(ego, caps, veh, walk, lig, MAP_SIZE, MAP_SIZE,
                            0, 0, interpret)


def render_bev_crop_pallas(map_data, ego_pos, ego_yaw, npc_pos, npc_yaw,
                           npc_active, walker_pos, walker_active,
                           light_state, dx: int = 0, dy: int = 0,
                           interpret: bool = False):
    """Render ONLY the 192x192 agent crop of the BEV window —
    bit-identical to crop_birdview(render_bev_pallas(...), dx, dy)
    (tests/test_pallas_bev.py) but ~2.8x fewer pixels. The crop window
    (models/layers.py:crop_birdview, common.py:18-26) spans frame rows
    [68+dx, 260+dx) and cols [64+dy, 256+dy)."""
    from ..constants import CROP_SIZE
    pack = jax.vmap(partial(_pack_params, map_data))
    ego, caps, veh, walk, lig = pack(ego_pos, ego_yaw, npc_pos, npc_yaw,
                                     npc_active, walker_pos, walker_active,
                                     light_state)
    row0 = 260 - CROP_SIZE // 2 + dx - CROP_SIZE // 2
    col0 = MAP_SIZE // 2 + dy - CROP_SIZE // 2
    return _call_bev_kernel(ego, caps, veh, walk, lig, CROP_SIZE,
                            CROP_SIZE, row0, col0, interpret)
