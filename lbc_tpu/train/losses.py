"""Training losses (reference: training/train_birdview.py:33-54,
train_image_phase1.py:66-70)."""
from __future__ import annotations

import jax.numpy as jnp


def location_loss(pred, target, crop_size: int = 192):
    """L1 on [-1, 1]-normalized waypoints, mean over points and coords.

    pred: (B, n_step, 2) in [-1, 1]; target: (B, n_step, 2) in *pixel*
    coordinates of the crop (LocationLoss normalizes pixels to [-1, 1],
    train_birdview.py:40-54). Returns (B,) per-sample loss.
    """
    t = (target / (crop_size / 2.0)) - 1.0
    return jnp.mean(jnp.abs(pred - t), axis=(-2, -1))


def location_loss_normalized(pred, target):
    """L1 between two [-1, 1] waypoint sets; per-sample. Used by phase 0/1
    distillation where both sides are already normalized."""
    return jnp.mean(jnp.abs(pred - target), axis=(-2, -1))


def all_branch_location_loss(pred_branches, target_branches):
    """Mean over command branches too (train_image_phase1.py:66-70)."""
    return jnp.mean(jnp.abs(pred_branches - target_branches),
                    axis=(-3, -2, -1))
