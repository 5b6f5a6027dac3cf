"""CIL-style baseline: direct control regression.

Capability parity with Baseline (/root/reference/bird_view/models/
baseline.py:27-90): image backbone + speed-encoder MLP -> joint embedding ->
four command branches predicting (steer, throttle, brake), plus a speed
prediction head for the speed-regularisation loss.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import normalize_imagenet, select_branch
from .resnet import get_resnet


class BaselineCIL(nn.Module):
    backbone: str = 'resnet18'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgb, velocity, command, train: bool = False):
        x = normalize_imagenet(rgb).astype(self.dtype)
        conv, c = get_resnet(self.backbone, bias_first=False,
                             dtype=self.dtype)
        h = conv(x, train=train)
        h = jnp.mean(h, axis=(1, 2))                        # global avg pool
        img_emb = nn.relu(nn.Dense(512, dtype=self.dtype, name='img_fc')(h))

        v = velocity[:, None].astype(self.dtype)
        v = nn.relu(nn.Dense(128, dtype=self.dtype, name='spd_fc1')(v))
        v = nn.relu(nn.Dense(128, dtype=self.dtype, name='spd_fc2')(v))

        joint = jnp.concatenate([img_emb, v], axis=-1)
        joint = nn.relu(nn.Dense(512, dtype=self.dtype, name='joint_fc')(joint))

        branches = []
        for k in range(4):
            b = nn.relu(nn.Dense(256, dtype=self.dtype,
                                 name=f'branch{k}_fc1')(joint))
            b = nn.Dense(3, dtype=self.dtype, name=f'branch{k}_fc2')(b)
            branches.append(b)
        branches = jnp.stack(branches, axis=1)              # (B, 4, 3)
        control = select_branch(branches, command)

        pred_speed = nn.Dense(1, dtype=self.dtype, name='speed_head')(img_emb)
        return control, pred_speed[:, 0]
