"""Fused Pallas TPU kernel for the forward RGB camera (384x160, fov 90).

TPU-native hot path for the image-agent/DAgger rollouts. The pure-XLA
renderer (render/camera.py) materializes (H, W, K) ray-hit tensors per
actor class between fusions; this kernel keeps the whole per-pixel program
in VMEM registers: ray setup, ground-plane capsule classification, K-actor
ray/OBB slab tests with a *running* nearest-hit composite, sky and weather
grading — one pass, zero HBM intermediates.

Geometry and appearance are kept semantically identical to
render/camera.py (same pinhole model as the reference sensor rig,
carla_utils.py:666-676, inverted by ImageAgent.unproject image.py:198-219)
so the two paths cross-check numerically (tests/test_camera_kernel.py).

Layout notes: W = 384 = 3 x 128 lanes; rows tile at 32 sublanes; output is
channel-first (B, 8, 160, 384) with channels [r, g, b, depth-unused...],
transposed to NHWC by the wrapper. Actor/segment top-k selection stays in
XLA where gathers are cheap; the kernel sees small (K, 8) VMEM tables.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (CAMERA_FOV, CAMERA_HEIGHT, CAMERA_WIDTH, CAMERA_X,
                         CAMERA_Z, EGO_EXTENT_X, EGO_EXTENT_Y, WALKER_EXTENT)
from ..engine.lights import GREEN, RED, YELLOW
from ..render.camera import (K_LIGHT, K_VEH, K_WALK, LANE_COLOR,
                             LIGHT_HEAD_SIZE, LIGHT_HEAD_Z, MAX_DEPTH,
                             OFFROAD_COLOR, ROAD_COLOR, SHADOW_DARK,
                             SHADOW_SOFT, SIDEWALK_COLOR, TEX_COARSE,
                             TEX_FINE, VEHICLE_HEIGHT, WALKER_COLOR,
                             WALKER_HEIGHT, WEATHER_FOG, WEATHER_SKY_BOT,
                             WEATHER_SKY_TOP, WEATHER_SUN, WEATHER_WET,
                             WET_REFLECT, _vehicle_color)
from ..render.geometry import (DASH_ON, DASH_PERIOD, LANE_HALF_WIDTH,
                               SIDEWALK_WIDTH, select_capsules)

TILE_ROWS = 32
N_TILES = CAMERA_HEIGHT // TILE_ROWS
K_CAPS_CAM = 16
LIGHT_ROWS = 8          # K_LIGHT padded to a sublane multiple

# static Python-float copies of the palette (jnp constants would be
# captured by the kernel closure, which pallas_call rejects)
_ROAD = tuple(float(x) for x in ROAD_COLOR)
_LANE = tuple(float(x) for x in LANE_COLOR)
_SIDEWALK = tuple(float(x) for x in SIDEWALK_COLOR)
_OFFROAD = tuple(float(x) for x in OFFROAD_COLOR)
_WALKER = tuple(float(x) for x in WALKER_COLOR)


def _slab(o, d, lo, hi):
    d = jnp.where(jnp.abs(d) < 1e-6, 1e-6, d)
    t1 = (lo - o) / d
    t2 = (hi - o) / d
    return jnp.minimum(t1, t2), jnp.maximum(t1, t2)


def _camera_kernel(par_ref, caps_ref, veh_ref, walk_ref, light_ref,
                   out_ref):
    """Row-tile kernel. Refs (leading env-block dim of 1):
      par:   (1, 4, 8)  row0 = [ox, oy, oz, fwd_x, fwd_y, lat_x, lat_y, f]
                        row1 = [sky_t rgb, sky_b rgb, sun, fog]
                        row2 = [wet, ...pad]
      caps:  (1, K_CAPS_CAM, 8) [x0, y0, x1, y1, hw, s0, seg_len, pad]
      veh:   (1, K_VEH, 8)  [x, y, cos, sin, valid, r, g, b]
      walk:  (1, K_WALK, 8) [x, y, valid, ...]
      light: (1, LIGHT_ROWS, 8) [x, y, valid, r, g, b, ...]
      out:   (1, 8, TILE_ROWS, 384)
    """
    tile = pl.program_id(1)

    ox = par_ref[0, 0, 0]
    oy = par_ref[0, 0, 1]
    oz = par_ref[0, 0, 2]
    fx = par_ref[0, 0, 3]
    fy = par_ref[0, 0, 4]
    lx = par_ref[0, 0, 5]
    ly = par_ref[0, 0, 6]
    f = par_ref[0, 0, 7]

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, CAMERA_WIDTH), 0).astype(jnp.float32) \
        + tile.astype(jnp.float32) * TILE_ROWS
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_ROWS, CAMERA_WIDTH), 1).astype(jnp.float32)
    u = (cols - CAMERA_WIDTH / 2.0) / f
    v = (rows - CAMERA_HEIGHT / 2.0) / f
    dxw = fx + u * lx
    dyw = fy + u * ly
    dz = -v

    # --- ground plane: capsule road/sidewalk/lane classification --------
    below = dz < -1e-4
    t_g = jnp.clip(jnp.where(below, -oz / jnp.where(below, dz, -1.0),
                             MAX_DEPTH), 0.0, MAX_DEPTH)
    gx = ox + t_g * dxw
    gy = oy + t_g * dyw
    on_road = jnp.zeros_like(gx, jnp.bool_)
    on_walk = jnp.zeros_like(gx, jnp.bool_)
    on_lane = jnp.zeros_like(gx, jnp.bool_)
    for k in range(K_CAPS_CAM):
        x0 = caps_ref[0, k, 0]
        y0 = caps_ref[0, k, 1]
        abx = caps_ref[0, k, 2] - x0
        aby = caps_ref[0, k, 3] - y0
        hw = caps_ref[0, k, 4]
        s0 = caps_ref[0, k, 5]
        seg_len = caps_ref[0, k, 6]
        denom = jnp.maximum(abx * abx + aby * aby, 1e-9)
        t = jnp.clip(((gx - x0) * abx + (gy - y0) * aby) / denom, 0., 1.)
        ddx = gx - (x0 + t * abx)
        ddy = gy - (y0 + t * aby)
        d2 = ddx * ddx + ddy * ddy
        on_road = on_road | (d2 <= hw * hw)
        sw = hw + SIDEWALK_WIDTH
        on_walk = on_walk | (d2 <= sw * sw)
        dash_on = jnp.mod(s0 + t * seg_len, DASH_PERIOD) < DASH_ON
        on_lane = on_lane | ((d2 <= LANE_HALF_WIDTH * LANE_HALF_WIDTH)
                             & dash_on)

    # --- ground realism (identical math to render/camera.py:
    #     ground_texture / WET_REFLECT blend / contact_shadow) -----------
    def hashn(ix, iy):
        # exact integer hash — see render/camera.py:_hash_noise
        x = (ix.astype(jnp.int32).astype(jnp.uint32)
             * jnp.uint32(2654435761)
             + iy.astype(jnp.int32).astype(jnp.uint32) * jnp.uint32(40503)
             + jnp.uint32(0x9E3779B9))
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x85EBCA6B)
        x = x ^ (x >> 13)
        # Mosaic has no uint32->f32 convert; the masked value is < 2^24
        # so routing through int32 is bit-identical
        return (x & jnp.uint32(0xFFFFFF)).astype(jnp.int32) \
            .astype(jnp.float32) / float(1 << 24)

    fade = jnp.clip(1.0 - t_g / 48.0, 0.0, 1.0)
    tex = 1.0 + (0.10 * (hashn(jnp.floor(gx * TEX_COARSE),
                               jnp.floor(gy * TEX_COARSE)) - 0.5)
                 + 0.06 * (hashn(jnp.floor(gx * TEX_FINE),
                                 jnp.floor(gy * TEX_FINE)) - 0.5)) * fade
    refl = par_ref[0, 2, 0] * WET_REFLECT

    def foot_shade(cx, cy, c, s, ex, ey, valid):
        px = gx - cx
        py = gy - cy
        bx = px * c + py * s
        by = -px * s + py * c
        mx = jnp.maximum(jnp.abs(bx) - ex, 0.0)
        my = jnp.maximum(jnp.abs(by) - ey, 0.0)
        d = jnp.sqrt(mx * mx + my * my)
        fall = jnp.clip(d / SHADOW_SOFT, 0.0, 1.0)
        sh = SHADOW_DARK + (1.0 - SHADOW_DARK) * fall
        return jnp.where(valid > 0.5, sh, 1.0)

    shade_v = jnp.ones_like(gx)
    for k in range(K_VEH):
        shade_v = jnp.minimum(shade_v, foot_shade(
            veh_ref[0, k, 0], veh_ref[0, k, 1], veh_ref[0, k, 2],
            veh_ref[0, k, 3], EGO_EXTENT_X, EGO_EXTENT_Y,
            veh_ref[0, k, 4]))
    shade_w = jnp.ones_like(gx)
    for k in range(K_WALK):
        shade_w = jnp.minimum(shade_w, foot_shade(
            walk_ref[0, k, 0], walk_ref[0, k, 1], 1.0, 0.0,
            WALKER_EXTENT, WALKER_EXTENT, walk_ref[0, k, 2]))
    shade_g = shade_v * shade_w

    def ground_ch(i):
        base = jnp.where(
            on_lane, _LANE[i],
            jnp.where(on_road, _ROAD[i],
                      jnp.where(on_walk, _SIDEWALK[i], _OFFROAD[i])))
        g = base * tex
        g = jnp.where(on_road, g * (1.0 - refl) + par_ref[0, 1, 3 + i]
                      * refl, g)
        return g * shade_g

    # --- sky -------------------------------------------------------------
    elev = jnp.clip(-dz * 4.0, 0.0, 1.0)
    sky = [par_ref[0, 1, 3 + i] * (1.0 - elev) + par_ref[0, 1, i] * elev
           for i in range(3)]

    col = [jnp.where(below, ground_ch(i), sky[i]) for i in range(3)]
    depth = jnp.where(below, t_g, MAX_DEPTH)

    # --- actors: running nearest-hit composite ---------------------------
    def box_hit(cx, cy, c, s, ex, ey, z0, h):
        obx = (ox - cx) * c + (oy - cy) * s
        oby = -(ox - cx) * s + (oy - cy) * c
        dxb = dxw * c + dyw * s
        dyb = -dxw * s + dyw * c
        tx1, tx2 = _slab(obx, dxb, -ex, ex)
        ty1, ty2 = _slab(oby, dyb, -ey, ey)
        tz1, tz2 = _slab(oz - z0, dz, 0.0, h)
        tmin = jnp.maximum(jnp.maximum(tx1, ty1), tz1)
        tmax = jnp.minimum(jnp.minimum(tx2, ty2), tz2)
        hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < MAX_DEPTH)
        t = jnp.maximum(tmin, 0.0)
        shade = jnp.where(tx1 >= jnp.maximum(ty1, tz1), 0.9,
                          jnp.where(ty1 >= tz1, 0.7, 1.0))
        return hit, t, shade

    for k in range(K_VEH):
        hit, t, shade = box_hit(veh_ref[0, k, 0], veh_ref[0, k, 1],
                                veh_ref[0, k, 2], veh_ref[0, k, 3],
                                EGO_EXTENT_X, EGO_EXTENT_Y,
                                0.0, VEHICLE_HEIGHT)
        closer = hit & (veh_ref[0, k, 4] > 0.5) & (t < depth)
        for i in range(3):
            col[i] = jnp.where(closer, veh_ref[0, k, 5 + i] * shade,
                               col[i])
        depth = jnp.where(closer, t, depth)

    for k in range(K_WALK):
        hit, t, shade = box_hit(walk_ref[0, k, 0], walk_ref[0, k, 1],
                                1.0, 0.0, WALKER_EXTENT, WALKER_EXTENT,
                                0.0, WALKER_HEIGHT)
        closer = hit & (walk_ref[0, k, 2] > 0.5) & (t < depth)
        for i in range(3):
            col[i] = jnp.where(closer, _WALKER[i] * shade, col[i])
        depth = jnp.where(closer, t, depth)

    for k in range(K_LIGHT):
        hit, t, _ = box_hit(light_ref[0, k, 0], light_ref[0, k, 1],
                            1.0, 0.0, LIGHT_HEAD_SIZE, LIGHT_HEAD_SIZE,
                            LIGHT_HEAD_Z, LIGHT_HEAD_SIZE * 2)
        closer = hit & (light_ref[0, k, 2] > 0.5) & (t < depth)
        for i in range(3):
            col[i] = jnp.where(closer, light_ref[0, k, 3 + i], col[i])
        depth = jnp.where(closer, t, depth)

    # --- weather grading ---------------------------------------------------
    sun = par_ref[0, 1, 6]
    fog = par_ref[0, 1, 7]
    wet = par_ref[0, 2, 0]
    gain = (0.55 + 0.45 * sun) * (1.0 - 0.25 * wet)
    fog_f = 1.0 - jnp.exp(-fog * jnp.minimum(depth, MAX_DEPTH))
    keep = 1.0 - fog_f
    for i in range(3):
        out_ref[0, i] = jnp.clip(
            col[i] * gain * keep + par_ref[0, 1, 3 + i] * fog_f, 0.0, 1.0)
    zero = jnp.zeros_like(depth)
    for i in range(3, 8):
        out_ref[0, i] = zero


def _select(pos, active, cam_xy, fwd, k):
    """Nearest-K actors in front of the camera (parity with
    render/camera.py select())."""
    rel = pos - cam_xy
    d2 = jnp.sum(rel * rel, axis=-1)
    infront = (rel @ fwd) > -5.0
    d2 = jnp.where(active & infront, d2, jnp.inf)
    k = min(k, pos.shape[0])
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, jnp.isfinite(neg)


def _pack_camera(map_data, ego_pos, ego_yaw, npc_pos, npc_yaw, npc_active,
                 walker_pos, walker_active, light_state, weather):
    f = CAMERA_WIDTH / (2.0 * jnp.tan(jnp.deg2rad(CAMERA_FOV) / 2.0))
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    lat = jnp.stack([-jnp.sin(ego_yaw), jnp.cos(ego_yaw)])
    cam_xy = ego_pos + CAMERA_X * fwd
    wid = jnp.clip(weather, 1, 14)

    par = jnp.zeros((4, 8), jnp.float32)
    par = par.at[0].set(jnp.array([cam_xy[0], cam_xy[1], CAMERA_Z,
                                   fwd[0], fwd[1], lat[0], lat[1], f]))
    par = par.at[1, 0:3].set(WEATHER_SKY_TOP[wid])
    par = par.at[1, 3:6].set(WEATHER_SKY_BOT[wid])
    par = par.at[1, 6].set(WEATHER_SUN[wid])
    par = par.at[1, 7].set(WEATHER_FOG[wid])
    par = par.at[2, 0].set(WEATHER_WET[wid])

    caps_sel, dash_sel = select_capsules(map_data.road_capsules,
                                         map_data.lane_dashes,
                                         cam_xy + 25.0 * fwd, K_CAPS_CAM)
    caps = jnp.zeros((K_CAPS_CAM, 8), jnp.float32)
    caps = caps.at[:, 0:5].set(caps_sel[:, 0:5])
    caps = caps.at[:, 5].set(dash_sel[:, 4])
    caps = caps.at[:, 6].set(dash_sel[:, 5])

    vi, vv = _select(npc_pos, npc_active, cam_xy, fwd, K_VEH)
    kv = vi.shape[0]
    veh = jnp.zeros((K_VEH, 8), jnp.float32)
    veh = veh.at[:kv, 0:2].set(npc_pos[vi])
    veh = veh.at[:kv, 2].set(jnp.cos(npc_yaw[vi]))
    veh = veh.at[:kv, 3].set(jnp.sin(npc_yaw[vi]))
    veh = veh.at[:kv, 4].set(vv.astype(jnp.float32))
    veh = veh.at[:kv, 5:8].set(_vehicle_color(vi))

    wi, wv = _select(walker_pos, walker_active, cam_xy, fwd, K_WALK)
    kw = wi.shape[0]
    walk = jnp.zeros((K_WALK, 8), jnp.float32)
    walk = walk.at[:kw, 0:2].set(walker_pos[wi])
    walk = walk.at[:kw, 2].set(wv.astype(jnp.float32))

    light_pos = map_data.light_draw_pos
    li, lv = _select(light_pos, jnp.ones(light_pos.shape[0], bool),
                     cam_xy, fwd, K_LIGHT)
    kl = li.shape[0]
    lst = light_state[li]
    lcol = jnp.where((lst == RED)[:, None], jnp.array([0.95, 0.1, 0.1]),
                     jnp.where((lst == YELLOW)[:, None],
                               jnp.array([0.95, 0.8, 0.1]),
                               jnp.array([0.1, 0.9, 0.2])))
    lig = jnp.zeros((LIGHT_ROWS, 8), jnp.float32)
    lig = lig.at[:kl, 0:2].set(light_pos[li])
    lig = lig.at[:kl, 2].set(lv.astype(jnp.float32))
    lig = lig.at[:kl, 3:6].set(lcol)
    return par, caps, veh, walk, lig


def render_camera_pallas(map_data, ego_pos, ego_yaw, npc_pos, npc_yaw,
                         npc_active, walker_pos, walker_active,
                         light_state, weather, interpret: bool = False):
    """Batched fused camera: all leading args batched (B, ...); light
    poles come from map_data. Returns (B, 160, 384, 3) float32 in [0, 1].
    """
    pack = jax.vmap(partial(_pack_camera, map_data))
    par, caps, veh, walk, lig = pack(ego_pos, ego_yaw, npc_pos, npc_yaw,
                                     npc_active, walker_pos, walker_active,
                                     light_state, weather)
    b = par.shape[0]
    out = pl.pallas_call(
        _camera_kernel,
        grid=(b, N_TILES),
        in_specs=[
            pl.BlockSpec((1, 4, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_CAPS_CAM, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_VEH, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_WALK, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LIGHT_ROWS, 8), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, TILE_ROWS, CAMERA_WIDTH),
            lambda i, j: (i, 0, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, 8, CAMERA_HEIGHT, CAMERA_WIDTH), jnp.float32),
        interpret=interpret,
    )(par, caps, veh, walk, lig)
    return jnp.transpose(out[:, :3], (0, 2, 3, 1))


def render_camera_state_pallas(map_data, state, interpret: bool = False):
    """Batched state -> (B, 160, 384, 3); drop-in for
    vmap(render_camera_state) on TPU."""
    from ..engine.lights import light_states_md
    lstate = jax.vmap(
        lambda t0, tick: light_states_md(map_data, t0, tick)
    )(state.episode.light_t0, state.episode.tick)
    return render_camera_pallas(
        map_data, state.ego.pos, state.ego.yaw, state.npc.pos,
        state.npc.yaw, state.npc.active, state.walkers.pos,
        state.walkers.active, lstate, state.episode.weather,
        interpret=interpret)
