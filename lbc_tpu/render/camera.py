"""Forward RGB camera renderer (384x160, fov 90), pure JAX.

TPU-native replacement of the CARLA RGB sensor the image agent consumes
(carla_utils.py:666-676). The pinhole geometry matches exactly what
ImageAgent.unproject inverts (image.py:198-219): f = W / (2 tan(fov/2)),
camera at (x=+2.0 m, z=1.4 m) on the hero, zero pitch.

Rendering model (one fused elementwise program per pixel):
* ground plane via ray-plane intersection, colored from the town rasters
  (road / lane marking / sidewalk / offroad) with hash-noise albedo
  texture, wet-sky reflection on the road, and actor contact shadows;
* nearest actor boxes (vehicles, walkers) and traffic-light heads via
  per-pixel ray-OBB slab tests against the K nearest actors;
* sky gradient, distance fog, and a per-weather appearance table standing
  in for CARLA's 14 weather presets (carla_utils.py:20-44) — sun/rain
  change tint, contrast and sky, so new-weather generalisation remains a
  real axis of the benchmark.

This is a semantic renderer, not a photoreal one: the image agent trains
and evaluates in one consistent visual domain (documented divergence from
the reference, whose RGB comes from UE4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import (CAMERA_FOV, CAMERA_HEIGHT, CAMERA_WIDTH, CAMERA_X,
                         CAMERA_Z, EGO_EXTENT_X, EGO_EXTENT_Y,
                         PIXELS_PER_METER, WALKER_EXTENT)
from ..engine.lights import GREEN, RED, YELLOW

K_VEH = 12
K_WALK = 12
K_LIGHT = 6
MAX_DEPTH = 120.0

VEHICLE_HEIGHT = 1.5
WALKER_HEIGHT = 1.8
LIGHT_HEAD_Z = 2.8          # traffic-light head height
LIGHT_HEAD_SIZE = 0.45

# base colors (linear-ish [0,1])
ROAD_COLOR = jnp.array([0.35, 0.35, 0.36])
LANE_COLOR = jnp.array([0.80, 0.78, 0.70])
SIDEWALK_COLOR = jnp.array([0.55, 0.52, 0.50])
OFFROAD_COLOR = jnp.array([0.30, 0.42, 0.28])
WALKER_COLOR = jnp.array([0.55, 0.30, 0.25])

# weather appearance: id -> (sky_top, sky_bot, sun, fog, wet)
_W = {
    1: ((0.35, 0.55, 0.85), (0.75, 0.85, 0.95), 1.00, 0.002, 0.0),
    2: ((0.55, 0.60, 0.65), (0.80, 0.82, 0.85), 0.85, 0.004, 0.0),
    3: ((0.45, 0.55, 0.70), (0.75, 0.80, 0.88), 0.90, 0.004, 0.5),
    4: ((0.50, 0.55, 0.60), (0.72, 0.75, 0.80), 0.80, 0.006, 0.6),
    5: ((0.45, 0.48, 0.52), (0.65, 0.68, 0.72), 0.70, 0.010, 0.7),
    6: ((0.35, 0.38, 0.42), (0.55, 0.58, 0.62), 0.60, 0.015, 0.9),
    7: ((0.50, 0.53, 0.58), (0.70, 0.73, 0.78), 0.75, 0.008, 0.6),
    8: ((0.90, 0.55, 0.35), (0.95, 0.75, 0.55), 0.80, 0.004, 0.0),
    9: ((0.75, 0.55, 0.45), (0.85, 0.70, 0.60), 0.70, 0.006, 0.0),
    10: ((0.70, 0.50, 0.40), (0.80, 0.65, 0.55), 0.65, 0.008, 0.5),
    11: ((0.65, 0.50, 0.42), (0.75, 0.62, 0.55), 0.60, 0.010, 0.6),
    12: ((0.55, 0.42, 0.38), (0.65, 0.55, 0.50), 0.55, 0.012, 0.7),
    13: ((0.45, 0.35, 0.32), (0.55, 0.45, 0.42), 0.45, 0.018, 0.9),
    14: ((0.60, 0.45, 0.40), (0.70, 0.58, 0.52), 0.60, 0.010, 0.6),
}
WEATHER_SKY_TOP = jnp.array([_W.get(i, _W[1])[0] for i in range(15)])
WEATHER_SKY_BOT = jnp.array([_W.get(i, _W[1])[1] for i in range(15)])
WEATHER_SUN = jnp.array([_W.get(i, _W[1])[2] for i in range(15)])
WEATHER_FOG = jnp.array([_W.get(i, _W[1])[3] for i in range(15)])
WEATHER_WET = jnp.array([_W.get(i, _W[1])[4] for i in range(15)])


# ground realism knobs (identical constants in ops/camera_kernel.py)
TEX_COARSE = 1.0            # 1 m albedo cells
TEX_FINE = 3.0              # 0.33 m albedo cells
WET_REFLECT = 0.30          # sky blended into wet road
SHADOW_DARK = 0.55          # contact-shadow floor under an actor
SHADOW_SOFT = 0.6           # falloff distance (m) outside the footprint


def _hash_noise(ix, iy):
    """Deterministic [0,1) value noise from integer lattice coords.

    Integer multiply-xorshift (same family as engine/npc.py:_hash01), NOT
    the classic fract(sin(...)) hash: sin-based hashes flip by ~0.36 per
    one-ulp change of the argument, so any fp-scheduling difference
    between the XLA renderer and the Pallas kernel would decorrelate the
    texture everywhere. Integer ops are exact in both paths."""
    x = (ix.astype(jnp.int32).astype(jnp.uint32) * jnp.uint32(2654435761)
         + iy.astype(jnp.int32).astype(jnp.uint32) * jnp.uint32(40503)
         + jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    return (x & jnp.uint32(0xFFFFFF)).astype(jnp.float32) / float(1 << 24)


def ground_texture(gx, gy, dist):
    """Two-octave albedo multiplier ~1 +- 0.08, faded out by distance
    (cells become sub-pixel past ~50 m: fading is the minification
    anti-alias AND keeps the XLA/Pallas paths numerically comparable —
    at the horizon one-ulp ground-point differences flip hash cells)."""
    fine = _hash_noise(jnp.floor(gx * TEX_FINE), jnp.floor(gy * TEX_FINE))
    coarse = _hash_noise(jnp.floor(gx * TEX_COARSE),
                         jnp.floor(gy * TEX_COARSE))
    fade = jnp.clip(1.0 - dist / 48.0, 0.0, 1.0)
    return 1.0 + (0.10 * (coarse - 0.5) + 0.06 * (fine - 0.5)) * fade


def contact_shadow(gpts, center_xy, yaw, ex, ey, valid):
    """Per-pixel ambient-occlusion shade from K actor footprints.

    gpts: (H, W, 2) ground points; center/yaw/valid: (K,). Returns
    (H, W) multiplier in [SHADOW_DARK, 1].
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    px = gpts[..., None, 0] - center_xy[..., 0]
    py = gpts[..., None, 1] - center_xy[..., 1]
    bx = px * c + py * s
    by = -px * s + py * c
    mx = jnp.maximum(jnp.abs(bx) - ex, 0.0)
    my = jnp.maximum(jnp.abs(by) - ey, 0.0)
    d = jnp.sqrt(mx * mx + my * my)
    fall = jnp.clip(d / SHADOW_SOFT, 0.0, 1.0)
    shade = SHADOW_DARK + (1.0 - SHADOW_DARK) * fall
    shade = jnp.where(valid, shade, 1.0)
    return jnp.min(shade, axis=-1)


def _vehicle_color(idx):
    """Deterministic per-actor paint job."""
    h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)) \
        & jnp.uint32(0xFFFF)
    r = 0.2 + 0.6 * ((h & 31) / 31.0)
    g = 0.2 + 0.6 * (((h >> 5) & 31) / 31.0)
    b = 0.2 + 0.6 * (((h >> 10) & 31) / 31.0)
    return jnp.stack([r, g, b], axis=-1)


def _ray_box_hit(origin, dirn, center_xy, yaw, ex, ey, h):
    """Ray vs upright OBB (z in [0, h]); returns (hit, t, normal_shade).

    origin: (3,), dirn: (Hp, Wp, 3), box params broadcast over K.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # world->box frame rotation of xy
    ox = origin[0] - center_xy[..., 0]
    oy = origin[1] - center_xy[..., 1]
    o_b = jnp.stack([ox * c + oy * s, -ox * s + oy * c], axis=-1)  # (K, 2)
    dx = dirn[..., None, 0] * c + dirn[..., None, 1] * s
    dy = -dirn[..., None, 0] * s + dirn[..., None, 1] * c
    dz = dirn[..., None, 2]
    o_bx = o_b[..., 0]
    o_by = o_b[..., 1]
    oz = origin[2]

    def slab(o, d, lo, hi):
        d = jnp.where(jnp.abs(d) < 1e-6, 1e-6, d)
        t1 = (lo - o) / d
        t2 = (hi - o) / d
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    tx1, tx2 = slab(o_bx, dx, -ex, ex)
    ty1, ty2 = slab(o_by, dy, -ey, ey)
    tz1, tz2 = slab(oz, dz, 0.0, h)
    tmin = jnp.maximum(jnp.maximum(tx1, ty1), tz1)
    tmax = jnp.minimum(jnp.minimum(tx2, ty2), tz2)
    hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < MAX_DEPTH)
    t = jnp.maximum(tmin, 0.0)
    # crude face shading: which slab bounded tmin
    shade = jnp.where(tx1 >= jnp.maximum(ty1, tz1), 0.9,
                      jnp.where(ty1 >= tz1, 0.7, 1.0))
    return hit, t, shade


def render_camera(map_data, ego_pos, ego_yaw, npc_pos, npc_yaw, npc_active,
                  walker_pos, walker_active, light_pos, light_state,
                  weather):
    """Single env -> (160, 384, 3) float32 in [0, 1]. vmap over envs."""
    f = CAMERA_WIDTH / (2.0 * jnp.tan(jnp.deg2rad(CAMERA_FOV) / 2.0))
    fwd = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    lat = jnp.stack([-jnp.sin(ego_yaw), jnp.cos(ego_yaw)])
    cam_xy = ego_pos + CAMERA_X * fwd
    origin = jnp.array([cam_xy[0], cam_xy[1], CAMERA_Z])

    u = (jnp.arange(CAMERA_WIDTH, dtype=jnp.float32) - CAMERA_WIDTH / 2.0) \
        / f
    v = (jnp.arange(CAMERA_HEIGHT, dtype=jnp.float32)
         - CAMERA_HEIGHT / 2.0) / f
    uu = u[None, :, None]                   # (1, W, 1)
    vv = v[:, None, None]                   # (H, 1, 1)
    dxy = jnp.broadcast_to(fwd[None, None, :] + uu * lat[None, None, :],
                           (CAMERA_HEIGHT, CAMERA_WIDTH, 2))
    dz_col = jnp.broadcast_to(-vv, (CAMERA_HEIGHT, CAMERA_WIDTH, 1))
    dirn = jnp.concatenate([dxy, dz_col], axis=-1)       # (H, W, 3)

    # --- ground (analytic capsule classification; gather-free) ---
    from .geometry import ground_class, select_capsules
    dz = dirn[..., 2]
    t_ground = jnp.where(dz < -1e-4, -CAMERA_Z / dz, MAX_DEPTH)
    t_ground = jnp.clip(t_ground, 0.0, MAX_DEPTH)
    gx = origin[0] + t_ground * dirn[..., 0]
    gy = origin[1] + t_ground * dirn[..., 1]
    gpts = jnp.stack([gx, gy], axis=-1)
    caps, dashes = select_capsules(map_data.road_capsules,
                                   map_data.lane_dashes,
                                   cam_xy + 25.0 * fwd, 16)
    gclass = ground_class(gpts, caps, dashes)
    ground_color = jnp.where(
        (gclass == 3)[..., None], LANE_COLOR,
        jnp.where((gclass == 2)[..., None], ROAD_COLOR,
                  jnp.where((gclass == 1)[..., None], SIDEWALK_COLOR,
                            OFFROAD_COLOR)))
    below_horizon = dz < -1e-4

    # --- actors: nearest K in front ---
    def select(pos, active, k):
        rel = pos - cam_xy
        d2 = jnp.sum(rel * rel, axis=-1)
        infront = (rel @ fwd) > -5.0
        d2 = jnp.where(active & infront, d2, jnp.inf)
        k = min(k, pos.shape[0])
        neg, idx = jax.lax.top_k(-d2, k)
        return idx, jnp.isfinite(neg)

    vi, vvalid = select(npc_pos, npc_active, K_VEH)
    wi_s, wvalid_s = select(walker_pos, walker_active, K_WALK)

    # --- ground realism: albedo texture, wet reflection, contact shadows
    wid = jnp.clip(weather, 1, 14)
    sky_b = WEATHER_SKY_BOT[wid]
    ground_color = ground_color * ground_texture(gx, gy,
                                                 t_ground)[..., None]
    refl = WEATHER_WET[wid] * WET_REFLECT
    on_road = (gclass >= 2)[..., None]
    ground_color = jnp.where(
        on_road, ground_color * (1 - refl) + sky_b[None, None] * refl,
        ground_color)
    shade = contact_shadow(gpts, npc_pos[vi], npc_yaw[vi],
                           EGO_EXTENT_X, EGO_EXTENT_Y, vvalid) \
        * contact_shadow(gpts, walker_pos[wi_s],
                         jnp.zeros_like(wi_s, jnp.float32),
                         WALKER_EXTENT, WALKER_EXTENT, wvalid_s)
    ground_color = ground_color * shade[..., None]

    # --- sky ---
    sky_t = WEATHER_SKY_TOP[wid]
    elev = jnp.clip(-dz * 4.0, 0.0, 1.0)
    sky = sky_b[None, None] * (1 - elev[..., None]) \
        + sky_t[None, None] * elev[..., None]

    color = jnp.where(below_horizon[..., None], ground_color, sky)
    depth = jnp.where(below_horizon, t_ground, MAX_DEPTH)
    vhit, vt, vshade = _ray_box_hit(
        origin, dirn, npc_pos[vi], npc_yaw[vi],
        EGO_EXTENT_X, EGO_EXTENT_Y, VEHICLE_HEIGHT)
    vt = jnp.where(vhit & vvalid[None, None], vt, jnp.inf)

    wi, wvalid = wi_s, wvalid_s
    whit, wt, wshade = _ray_box_hit(
        origin, dirn, walker_pos[wi], jnp.zeros_like(wi, jnp.float32),
        WALKER_EXTENT, WALKER_EXTENT, WALKER_HEIGHT)
    wt = jnp.where(whit & wvalid[None, None], wt, jnp.inf)

    li, lvalid = select(light_pos, jnp.ones(light_pos.shape[0], bool),
                        K_LIGHT)
    # light heads float at LIGHT_HEAD_Z: box from z0 to z0+size
    lhit, lt, _ = _ray_box_hit(
        origin - jnp.array([0.0, 0.0, LIGHT_HEAD_Z]), dirn,
        light_pos[li], jnp.zeros_like(li, jnp.float32),
        LIGHT_HEAD_SIZE, LIGHT_HEAD_SIZE, LIGHT_HEAD_SIZE * 2)
    lst = light_state[li]
    lcol = jnp.where((lst == RED)[:, None],
                     jnp.array([0.95, 0.1, 0.1]),
                     jnp.where((lst == YELLOW)[:, None],
                               jnp.array([0.95, 0.8, 0.1]),
                               jnp.array([0.1, 0.9, 0.2])))
    lt = jnp.where(lhit & lvalid[None, None], lt, jnp.inf)

    # composite nearest-hit per pixel: argmin over K then gather the
    # (K, 3) color table — never materialize an (H, W, K, 3) tensor
    # (a naive broadcast here OOM'd HBM at eval batch sizes)
    def composite(color, depth, ts, base_cols, shade=None):
        best = jnp.argmin(ts, axis=-1)                      # (H, W)
        tbest = jnp.min(ts, axis=-1)
        cbest = base_cols[best]                             # (H, W, 3)
        if shade is not None:
            sbest = jnp.take_along_axis(shade, best[..., None],
                                        axis=-1)[..., 0]
            cbest = cbest * sbest[..., None]
        closer = tbest < depth
        return (jnp.where(closer[..., None], cbest, color),
                jnp.where(closer, tbest, depth))

    color, depth = composite(color, depth, vt, _vehicle_color(vi),
                             shade=vshade)
    color, depth = composite(color, depth, wt,
                             jnp.broadcast_to(WALKER_COLOR,
                                              (wt.shape[-1], 3)),
                             shade=wshade)
    color, depth = composite(color, depth, lt, lcol)

    # --- weather: sun level, wet-dark, fog ---
    sun = WEATHER_SUN[wid]
    wet = WEATHER_WET[wid]
    fog = WEATHER_FOG[wid]
    color = color * (0.55 + 0.45 * sun)
    color = color * (1.0 - 0.25 * wet)
    fog_f = 1.0 - jnp.exp(-fog * jnp.minimum(depth, MAX_DEPTH))
    color = color * (1 - fog_f[..., None]) + sky_b * fog_f[..., None]

    return jnp.clip(color, 0.0, 1.0)


def render_camera_state(map_data, state):
    from ..engine.lights import light_states_md
    lstate = light_states_md(map_data, state.episode.light_t0,
                             state.episode.tick)
    return render_camera(map_data, state.ego.pos, state.ego.yaw,
                         state.npc.pos, state.npc.yaw, state.npc.active,
                         state.walkers.pos, state.walkers.active,
                         map_data.light_draw_pos, lstate,
                         state.episode.weather)
