"""DAgger visual audit: the reference's main phase-2 debugging tool.

Saves the top-k highest-weight (= worst student-vs-teacher) replay
samples after each episode as one PNG grid with the teacher's
selected-branch waypoints dotted over the RGB frame (parity with
train_image_phase2.py:231-252 / phase2_utils.py:273-289, which pushes
the same grid to tensorboard)."""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _waypoint_pixels(branches, command):
    """Teacher all-branch [-1,1] BEV waypoints -> camera pixels of the
    selected branch (the same projection the phase-0 target uses)."""
    import jax.numpy as jnp

    from ..train.coord_converter import bev_to_image
    img = np.asarray(bev_to_image(jnp.asarray(branches)))   # (K,4,5,2)
    sel = img[np.arange(len(command)), np.asarray(command) - 1]
    px = (sel[..., 0] + 1) / 2 * 384
    py = (sel[..., 1] + 1) / 2 * 160
    return px, py


def save_replay_audit(log_dir, buffer, episode: int, k: int = 16):
    """buffer: DeviceReplay; writes audit/ep%03d.png under log_dir."""
    from ..train.device_replay import replay_top_k
    k = int(min(k, int(buffer.size)))
    if k <= 0:
        return None
    fields, weight = replay_top_k(buffer, k)
    rgb, branches, command = fields['rgb'], fields['teacher_branches'], \
        fields['command']
    rgb = np.asarray(rgb).copy()
    px, py = _waypoint_pixels(np.asarray(branches), np.asarray(command))
    for i in range(k):
        for x, y in zip(px[i], py[i]):
            xi, yi = int(round(x)), int(round(y))
            if 1 <= xi < 383 and 1 <= yi < 159:
                rgb[i, yi - 1:yi + 2, xi - 1:xi + 2] = (255, 40, 40)
    cols = 4
    rows = (k + cols - 1) // cols
    grid = np.zeros((rows * 160, cols * 384, 3), np.uint8)
    for i in range(k):
        r, c = divmod(i, cols)
        grid[r * 160:(r + 1) * 160, c * 384:(c + 1) * 384] = rgb[i]
    out = Path(log_dir) / 'audit'
    out.mkdir(parents=True, exist_ok=True)
    path = out / f'ep{episode:03d}.png'
    try:
        import cv2
        cv2.imwrite(str(path), grid[..., ::-1])
    except Exception:
        import imageio
        imageio.imwrite(str(path), grid)
    return path
