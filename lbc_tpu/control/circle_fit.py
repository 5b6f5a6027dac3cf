"""Algebraic least-squares circle fit, batched and jit-safe.

Capability parity with ls_circle (/root/reference/bird_view/models/
controller.py:8-40): Kasa fit via the 2x2 normal equations on centered
coordinates. Solved in closed form (no linalg.solve) with a tiny Tikhonov
term so collinear waypoints (straight driving) degrade gracefully to a
huge-radius circle instead of NaNs — the projection-based steering then
reduces to "aim at the point", matching the reference's behavior where
np.linalg.solve returns an enormous circle.
"""
from __future__ import annotations

import jax.numpy as jnp


def ls_circle(points, eps=1e-6):
    """points: (..., N, 2) -> (center (..., 2), radius (...,))."""
    pts = points.astype(jnp.float32)
    mean = jnp.mean(pts, axis=-2, keepdims=True)
    uv = pts - mean
    u = uv[..., 0]
    v = uv[..., 1]

    suu = jnp.sum(u * u, axis=-1)
    suv = jnp.sum(u * v, axis=-1)
    svv = jnp.sum(v * v, axis=-1)
    suuu = jnp.sum(u ** 3, axis=-1)
    suvv = jnp.sum(u * v * v, axis=-1)
    svvv = jnp.sum(v ** 3, axis=-1)
    svuu = jnp.sum(v * u * u, axis=-1)

    b0 = 0.5 * (suuu + suvv)
    b1 = 0.5 * (svvv + svuu)

    # Solve [[suu, suv], [suv, svv]] @ c = b with Tikhonov regularisation.
    reg = eps * (suu + svv + 1.0)
    a00 = suu + reg
    a11 = svv + reg
    det = a00 * a11 - suv * suv
    cx = (b0 * a11 - b1 * suv) / det
    cy = (a00 * b1 - suv * b0) / det

    n = pts.shape[-2]
    r = jnp.sqrt(cx * cx + cy * cy + (suu + svv) / n)

    center = jnp.stack([cx, cy], axis=-1) + mean[..., 0, :]
    return center, r


def project_point_to_circle(point, center, radius, eps=1e-8):
    """Closest point on the circle (common.py:47-51), batched."""
    direction = point - center
    norm = jnp.sqrt(jnp.sum(direction * direction, axis=-1, keepdims=True))
    return center + direction / (norm + eps) * radius[..., None]


def signed_angle_from_forward(w, eps=1e-8):
    """signed_angle((1,0,0), (wx,wy,0)) from common.py:38-44.

    acos of the normalized dot with sign from the z cross component reduces
    exactly to atan2(wy, wx).
    """
    return jnp.arctan2(w[..., 1], w[..., 0] + eps * (w[..., 0] == 0))
