"""RGB image policy network (the distilled student).

Capability parity with ImagePolicyModelSS
(/root/reference/bird_view/models/image.py:22-89): resnet34 on a 384x160
RGB frame (ImageNet-normalized inside the net), velocity late fusion,
deconv to 96x40, four command branches of spatial-softmax waypoint heads
over image coordinates.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import VelocityFusionHead, normalize_imagenet, select_branch
from .resnet import get_resnet


class ImagePolicy(nn.Module):
    backbone: str = 'resnet34'
    n_step: int = 5
    all_branch: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, velocity, command, train: bool = False):
        """rgb: (B, 160, 384, 3) float in [0,1]; velocity: (B,);
        command: (B, 4) one-hot. Returns (B, n_step, 2) in [-1,1] image
        coords ([...,0] = x across width, [...,1] = y down height)."""
        x = normalize_imagenet(rgb).astype(self.dtype)
        conv, _ = get_resnet(self.backbone, bias_first=False,
                             dtype=self.dtype)
        h = conv(x, train=train)   # (B, 5, 12, 512)
        branches = VelocityFusionHead(
            n_step=self.n_step, dtype=self.dtype, name='head')(
                h, velocity, train=train)  # spatial softmax over (40, 96)
        selected = select_branch(branches, command)
        if self.all_branch:
            return selected, branches
        return selected
