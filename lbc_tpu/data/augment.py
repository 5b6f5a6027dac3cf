"""Image augmentation schedules in pure JAX.

Capability parity with /root/reference/bird_view/augmenter.py (imgaug
pipelines from COiLTRAiNE: blur, additive gaussian noise, pixel/coarse
dropout, brightness add/multiply, contrast normalization, with intensity
annealed by training iteration). imgaug is host-side and per-image; these
run batched on device inside the train step.

Each op applies with an independent per-image probability, matching the
`Sometimes(freq, ...)` structure (augmenter.py:227-279, 'super_hard'
schedule shape).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentParams(NamedTuple):
    freq: float = 0.3           # per-op application probability
    blur_sigma: float = 1.5
    noise_std: float = 0.07     # fraction of 255
    dropout_p: float = 0.06
    coarse_dropout_p: float = 0.12
    coarse_size: int = 16       # coarse dropout cell size, px
    add: float = 0.12           # brightness shift fraction
    multiply: float = 0.25      # brightness scale range
    contrast: float = 0.35


def anneal(params: AugmentParams, iteration) -> AugmentParams:
    """Intensity ramp by image iteration (augmenter.py anneals each factor
    over the first ~500k images)."""
    s = jnp.clip(iteration / 500_000.0, 0.0, 1.0)
    return AugmentParams(
        freq=params.freq * 0.5 * (1 + s),
        blur_sigma=params.blur_sigma * s,
        noise_std=params.noise_std * s,
        dropout_p=params.dropout_p * s,
        coarse_dropout_p=params.coarse_dropout_p * s,
        coarse_size=params.coarse_size,
        add=params.add * s,
        multiply=params.multiply * s,
        contrast=params.contrast * s)


def _gauss_blur(img, sigma):
    size = 5
    x = jnp.arange(size) - size // 2
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    k = k / jnp.sum(k)

    # separable blur: 1-D kernel over H then W
    def conv1d(a, axis):
        moved = jnp.moveaxis(a, axis, -1)
        pad = size // 2
        padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1)
                         + [(pad, pad)], mode='edge')
        out = jnp.zeros_like(moved)
        for i in range(size):
            out = out + k[i] * jax.lax.dynamic_slice_in_dim(
                padded, i, moved.shape[-1], axis=-1)
        return jnp.moveaxis(out, -1, axis)
    return conv1d(conv1d(img, 0), 1)


def augment_image(key, img, params: AugmentParams):
    """img: (H, W, 3) float in [0, 1] -> augmented, same range."""
    keys = jax.random.split(key, 8)
    h, w, _ = img.shape

    def maybe(k, fn, x):
        apply = jax.random.bernoulli(k, params.freq)
        return jnp.where(apply, fn(x), x)

    img = maybe(keys[0],
                lambda x: _gauss_blur(x, params.blur_sigma), img)
    img = maybe(keys[1],
                lambda x: x + params.noise_std * jax.random.normal(
                    keys[1], x.shape), img)
    img = maybe(keys[2],
                lambda x: x * (jax.random.uniform(keys[2], (h, w, 1))
                               > params.dropout_p), img)

    def coarse_drop(x):
        ch = max(h // params.coarse_size, 1)
        cw = max(w // params.coarse_size, 1)
        mask = (jax.random.uniform(keys[3], (ch, cw, 1))
                > params.coarse_dropout_p).astype(x.dtype)
        mask = jax.image.resize(mask, (h, w, 1), 'nearest')
        return x * mask

    img = maybe(keys[3], coarse_drop, img)
    img = maybe(keys[4],
                lambda x: x + jax.random.uniform(
                    keys[4], (), minval=-params.add, maxval=params.add),
                img)
    img = maybe(keys[5],
                lambda x: x * jax.random.uniform(
                    keys[5], (), minval=1 - params.multiply,
                    maxval=1 + params.multiply), img)
    img = maybe(keys[6],
                lambda x: (x - 0.5) * jax.random.uniform(
                    keys[6], (), minval=1 - params.contrast,
                    maxval=1 + params.contrast) + 0.5, img)
    return jnp.clip(img, 0.0, 1.0)


def augment_batch(key, images, params: AugmentParams):
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, im: augment_image(k, im, params))(keys,
                                                                images)
