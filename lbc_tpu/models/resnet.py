"""ResNet feature backbones in flax.linen, NHWC, TPU-friendly.

Capability parity with the reference's vendored torchvision ResNet
(/root/reference/bird_view/models/resnet.py:95-180): configurable input
channel count, optional bias on the stem conv, and a forward pass that
returns the stride-32 convolutional feature map (no pooling / fc head).

Design differences from the reference (TPU-first, not a translation):
NHWC layout so XLA tiles convs onto the MXU without transposes, a `dtype`
knob for bfloat16 compute with fp32 params/statistics, and flax BatchNorm
with explicit `train` control instead of torch module state.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x

        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = norm('bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = norm('bn2')(y)

        if self.stride != 1 or x.shape[-1] != self.filters:
            identity = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)

        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out_filters = self.filters * self.expansion

        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = nn.relu(norm('bn1')(y))
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name='conv2')(y)
        y = nn.relu(norm('bn2')(y))
        y = nn.Conv(out_filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3')(y)
        y = norm('bn3')(y)

        if self.stride != 1 or x.shape[-1] != out_filters:
            identity = nn.Conv(out_filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)

        return nn.relu(y + identity)


class ResNetFeatures(nn.Module):
    """Stride-32 convolutional feature extractor.

    Input: (B, H, W, C_in). Output: (B, H/32, W/32, C_out).
    """
    stage_sizes: Sequence[int]
    block: type = BasicBlock
    bias_first: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    use_bias=self.bias_first, dtype=self.dtype,
                    name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, (n_blocks, filters) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512))):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = self.block(filters=filters, stride=stride,
                               dtype=self.dtype,
                               name=f'layer{i + 1}_{j}')(x, train=train)
        return x


_MODEL_DEFS = {
    'resnet18': (BasicBlock, (2, 2, 2, 2), 512),
    'resnet34': (BasicBlock, (3, 4, 6, 3), 512),
    'resnet50': (Bottleneck, (3, 4, 6, 3), 2048),
    'resnet101': (Bottleneck, (3, 4, 23, 3), 2048),
    'resnet152': (Bottleneck, (3, 8, 36, 3), 2048),
}


def get_resnet(name: str = 'resnet18', bias_first: bool = True,
               dtype: jnp.dtype = jnp.float32):
    """Returns (module, feature_channels) for a named backbone.

    Mirrors the reference factory (resnet.py:171-180) minus torch-hub
    weight downloads (no egress; checkpoints come from our own training).
    """
    block, stages, c_out = _MODEL_DEFS[name]
    return ResNetFeatures(stage_sizes=stages, block=block,
                          bias_first=bias_first, dtype=dtype), c_out
