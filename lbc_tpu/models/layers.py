"""Shared model components (reference: bird_view/models/common.py).

Functional, batched, jit/vmap-safe equivalents of the reference's torch
modules. All feature maps are NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..constants import CROP_SIZE, MAP_SIZE

# ImageNet statistics (common.py:86-109).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(rgb):
    """(..., 3) float RGB in [0,1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=rgb.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=rgb.dtype)
    return (rgb - mean) / std


def spatial_softmax(feature_nhwc):
    """Soft-argmax over the spatial dims.

    Input (B, H, W, C); output (B, C, 2) with [..., 0] the expected x
    (width axis) and [..., 1] the expected y (height axis), both in [-1, 1].
    Matches the effective semantics of the reference SpatialSoftmax
    (common.py:112-152) including its constructor-arg-swap quirk, which for
    both call sites reduces to exactly this.
    """
    b, h, w, c = feature_nhwc.shape
    flat = feature_nhwc.reshape(b, h * w, c)
    weight = nn.softmax(flat.astype(jnp.float32), axis=1)
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    grid_x = jnp.tile(xs, h)                      # flatten of (H, W) cols
    grid_y = jnp.repeat(ys, w)                    # flatten of (H, W) rows
    ex = jnp.einsum('bpc,p->bc', weight, grid_x)
    ey = jnp.einsum('bpc,p->bc', weight, grid_y)
    return jnp.stack([ex, ey], axis=-1)


def select_branch(branches, one_hot):
    """Select the command branch: (B, 4, ...) x (B, 4) -> (B, ...).

    Reference: common.py:29-35. Dense compute + one-hot contraction keeps
    the op MXU/VPU-friendly (no gather, no dynamic control flow).
    """
    one_hot = one_hot.astype(branches.dtype)
    return jnp.einsum('bk...,bk->b...', branches, one_hot)


def crop_birdview(birdview, dx=0, dy=0):
    """192x192 crop of the 320x320 BEV (common.py:18-26).

    `birdview` is (..., 320, 320, C); row center 164+dx, col center 160+dy.
    """
    x = 260 - CROP_SIZE // 2 + dx
    y = MAP_SIZE // 2 + dy
    return birdview[...,
                    x - CROP_SIZE // 2: x + CROP_SIZE // 2,
                    y - CROP_SIZE // 2: y + CROP_SIZE // 2, :]


def one_hot_command(command, dtype=jnp.float32):
    """int command in {1..4} -> 4-dim one-hot (train_utils.py:33-40)."""
    return jax.nn.one_hot(jnp.asarray(command) - 1, 4, dtype=dtype)


def conv_transpose_s2_same(x, kernel, bias=None):
    """nn.ConvTranspose(C, (3,3), strides=(2,2), SAME), phase-decomposed.

    XLA lowers a stride-2 transposed conv as a conv over the 2x-dilated
    input: half the MACs hit inserted zeros, so the MXU runs at <=50%
    useful work. Decomposing by output phase is mathematically identical
    (same taps, no zeros): out[2i+p, 2j+q] touches only kernel taps with
    ty = p (mod 2), tx = q (mod 2), giving four dense stride-1 convs
    (2x2, 2x1, 1x2, 1x1) + a pixel interleave. Derivation pinned by
    tests/test_models.py::test_conv_transpose_phase_equivalence.

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) — the ConvTranspose
    param tensor verbatim. Returns (B, 2H, 2W, Cout).
    """
    from jax import lax
    b, h, w, _ = x.shape
    c_out = kernel.shape[-1]
    dn = ('NHWC', 'HWIO', 'NHWC')

    def conv(kern, pad):
        return lax.conv_general_dilated(x, kern, (1, 1), pad,
                                        dimension_numbers=dn)

    # lax.conv_transpose(SAME, k=3, s=2) pads the dilated input (2, 1):
    # output (2i+p, 2j+q) sums taps t with t = p (mod 2) over inputs
    # i-1+t//2 (p=0: t in {0,2}) or i (p=1: t=1); same along x.
    y00 = conv(kernel[::2, ::2], ((1, 0), (1, 0)))      # (2,2) taps
    y01 = conv(kernel[::2, 1::2], ((1, 0), (0, 0)))     # (2,1)
    y10 = conv(kernel[1::2, ::2], ((0, 0), (1, 0)))     # (1,2)
    y11 = conv(kernel[1::2, 1::2], ((0, 0), (0, 0)))    # (1,1)
    y = jnp.stack([y00, y01, y10, y11], axis=3)
    y = y.reshape(b, h, w, 2, 2, c_out)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c_out)
    if bias is not None:
        y = y + bias
    return y


class ConvTransposeS2(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (3,3), strides=(2,2),
    padding='SAME') computed via conv_transpose_s2_same — same param
    names/shapes/init (checkpoint-compatible), ~2x faster on the MXU
    (no dilated-input zero MACs). Numerically equal to 3e-8 (f32)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        return conv_transpose_s2_same(x, kernel, bias)


class VelocityFusionHead(nn.Module):
    """Late velocity fusion + deconv + per-command spatial-softmax heads.

    Shared trunk of both policy networks (birdview.py:34-79, image.py:37-89):
    tile the speed scalar to 128 channels, concat with backbone features,
    deconv x3 (doubling resolution each time), then 4 command branches of
    BN -> 1x1 conv to `n_step` maps -> spatial softmax.
    """
    n_step: int = 5
    n_commands: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, velocity, train: bool = False):
        b, h, w, c = features.shape
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        vel = velocity.reshape(b, 1, 1, 1).astype(features.dtype)
        vel = jnp.broadcast_to(vel, (b, h, w, 128))
        x = jnp.concatenate([features, vel], axis=-1)

        x = norm('deconv_bn0')(x)
        for i, ch in enumerate((256, 128, 64)):
            x = ConvTransposeS2(ch, dtype=self.dtype,
                                name=f'deconv{i + 1}')(x)
            x = nn.relu(x)
            if i < 2:
                x = norm(f'deconv_bn{i + 1}')(x)

        branch_locs = []
        for k in range(self.n_commands):
            hk = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              name=f'branch{k}_bn')(x)
            hk = nn.Conv(self.n_step, (1, 1), dtype=self.dtype,
                         name=f'branch{k}_conv')(hk)
            branch_locs.append(spatial_softmax(hk))
        return jnp.stack(branch_locs, axis=1)  # (B, 4, n_step, 2)
