"""Debug visualisation (reference: carla_utils.py:146-173)."""
from __future__ import annotations

import numpy as np

from ..constants import VIS_BACKGROUND, VIS_COLORS


def visualize_birdview(birdview) -> np.ndarray:
    """(H, W, 7) {0..1 or 0..255} -> (H, W, 3) uint8 palette image."""
    bv = np.asarray(birdview)
    h, w = bv.shape[:2]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[...] = VIS_BACKGROUND
    for i, color in enumerate(VIS_COLORS):
        canvas[bv[:, :, i] > 0] = color
    return canvas
