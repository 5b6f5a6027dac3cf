"""Privileged ("cheating") birdview policy network.

Capability parity with BirdViewPolicyModelSS
(/root/reference/bird_view/models/birdview.py:47-79): resnet18 on the
7-channel 192x192 BEV crop, velocity late fusion, deconv to 48x48, four
command branches of spatial-softmax waypoint heads (5 waypoints in [-1,1]^2
of the crop).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import VelocityFusionHead, select_branch
from .resnet import get_resnet


class BirdviewPolicy(nn.Module):
    backbone: str = 'resnet18'
    input_channel: int = 7
    n_step: int = 5
    all_branch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, birdview, velocity, command, train: bool = False):
        """birdview: (B, 192, 192, 7) float in [0,1]; velocity: (B,);
        command: (B, 4) one-hot. Returns (B, n_step, 2) in [-1,1]
        (and all four branches (B, 4, n_step, 2) when `all_branch`)."""
        conv, _ = get_resnet(self.backbone, bias_first=False,
                             dtype=self.dtype)
        h = conv(birdview.astype(self.dtype), train=train)
        branches = VelocityFusionHead(
            n_step=self.n_step, dtype=self.dtype, name='head')(
                h, velocity, train=train)
        selected = select_branch(branches, command)
        if self.all_branch:
            return selected, branches
        return selected
