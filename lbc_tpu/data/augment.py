"""Image augmentation schedules in pure JAX.

Capability parity with /root/reference/bird_view/augmenter.py (the imgaug
pipelines vendored from COiLTRAiNE): the 7 named schedules — medium /
soft / high / medium_harder / soft_harder / super_hard / custom — with
per-schedule intensity annealing by image iteration
(augmenter.py:17-388). Each schedule drives the same 8-op pipeline
(GaussianBlur, AdditiveGaussianNoise, CoarseDropout, Dropout, Add,
Multiply, ContrastNormalization, Grayscale), each op applied with the
annealed per-image probability and, with probability `color`, sampled
per channel (imgaug's `per_channel`).

imgaug runs host-side one image at a time; these run batched on device
inside the train step. Known divergence: imgaug applies the ops in
random order (`random_order=True`); here the order is fixed — the ops
commute to first order (blur/noise/dropout then affine intensity), and a
fixed order keeps the program static for XLA.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

SCHEDULE_NAMES = ('medium', 'soft', 'high', 'medium_harder',
                  'soft_harder', 'super_hard', 'custom')

# Coarse-dropout cell granularity: imgaug samples size_percent in
# [0.08, 0.2]; lax.switch over 3 static mask resolutions keeps shapes
# static under jit.
_COARSE_SIZE_PERCENTS = (0.08, 0.14, 0.2)


class AugmentParams(NamedTuple):
    """Annealed per-op parameters (all scalars; jnp or python floats)."""
    freq: jnp.ndarray           # per-op application probability
    color: jnp.ndarray          # per-channel sampling probability
    blur_max: jnp.ndarray       # GaussianBlur sigma ~ U(0, blur_max)
    noise_max: jnp.ndarray      # AdditiveGaussianNoise scale (0-255 units)
    dropout_max: jnp.ndarray    # Dropout/CoarseDropout p ~ U(0, this)
    add_max: jnp.ndarray        # Add ~ U(-a, a) (0-255 units)
    mult_lo: jnp.ndarray        # Multiply ~ U(lo, hi)
    mult_hi: jnp.ndarray
    contrast_lo: jnp.ndarray    # ContrastNormalization ~ U(lo, hi)
    contrast_hi: jnp.ndarray
    gray_max: jnp.ndarray = 1.0  # Grayscale alpha ~ U(0, gray_max)


def _dropout_factor(it):
    """Shared sigmoid decay used by every schedule (augmenter.py:23)."""
    return 0.198667 + (0.03856658 - 0.198667) \
        / (1 + (it / 196416.6) ** 1.863486)


# (it_div, freq_den, freq_cap, color_den, blur_den, add_den,
#  mult_pos_den, mult_neg_den, contrast_pos_scale, contrast_pos_den,
#  contrast_neg_den) — denominators of the reference's linear ramps.
_SCHEDULES = {
    # augmenter.py:17-67
    'medium': (48.0, 1e6, None, 1e6, 1e5, 150e3, 500e3, 500e3,
               0.5, 500e3, 500e3),
    # augmenter.py:70-119
    'soft': (48.0, 1.2e6, None, 1.2e6, 120e3, 170e3, 800e3, 800e3,
             0.5, 800e3, 800e3),
    # augmenter.py:122-171
    'high': (48.0, 800e3, None, 800e3, 80e3, 120e3, 350e3, 400e3,
             0.5, 350e3, 400e3),
    # augmenter.py:174-224 (medium with the faster /32 iteration clock)
    'medium_harder': (32.0, 1e6, None, 1e6, 1e5, 150e3, 500e3, 500e3,
                      0.5, 500e3, 500e3),
    # augmenter.py:339-388
    'soft_harder': (32.0, 1.2e6, None, 1.2e6, 120e3, 170e3, 800e3,
                    800e3, 0.5, 800e3, 800e3),
    # augmenter.py:227-279
    'super_hard': (32.0, 50e3, 1.0, 100e3, 100e3, 100e3, 200e3, 500e3,
                   0.5, 500e3, 500e3),
    # augmenter.py:282-336 (note the 0.2 contrast-pos scale)
    'custom': (32.0, 50e3, 1.0, 100e3, 20e3, 100e3, 300e3, 300e3,
               0.2, 500e3, 500e3),
}


def schedule_params(name: str, image_iteration) -> AugmentParams:
    """Annealed parameters of a named schedule at `image_iteration`
    (the number of images seen so far, augmenter.py's clock)."""
    import numpy as np

    # host-side numpy on purpose: these ~15 scalar ops run per batch, and
    # as jnp eager ops each would be a round trip over the TPU tunnel;
    # the results enter the jitted augment as ordinary dynamic scalars
    (it_div, freq_den, freq_cap, color_den, blur_den, add_den, mp_den,
     mn_den, cp_scale, cp_den, cn_den) = _SCHEDULES[name]
    it = np.float32(image_iteration) / np.float32(it_div)
    freq = 0.05 + it / freq_den
    if freq_cap is not None:
        freq = min(freq, freq_cap)
    drop = _dropout_factor(it)
    return AugmentParams(
        freq=np.clip(freq, 0.0, 1.0),
        color=np.clip(it / color_den, 0.0, 1.0),
        blur_max=np.float32(0.5 + 0.5 * it / blur_den),
        noise_max=np.float32(drop),
        dropout_max=np.float32(drop),
        add_max=np.float32(10.0 + 10.0 * it / add_den),
        mult_lo=np.maximum(np.float32(1.0 - 0.91 * it / mn_den), 0.0),
        mult_hi=np.float32(1.0 + 2.5 * it / mp_den),
        contrast_lo=np.maximum(np.float32(1.0 - 0.5 * it / cn_den), 0.0),
        contrast_hi=np.float32(1.0 + cp_scale * it / cp_den))


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


def _per_channel(key, color_p, lo, hi):
    """(3,) factors: shared across channels, or per-channel with
    probability `color_p` (imgaug per_channel semantics)."""
    ks, kp, kb = jax.random.split(key, 3)
    shared = jnp.full((3,), jax.random.uniform(ks, (), minval=lo,
                                               maxval=hi))
    per = jax.random.uniform(kp, (3,), minval=lo, maxval=hi)
    return jnp.where(jax.random.bernoulli(kb, color_p), per, shared)


def augment_image(key, img, params: AugmentParams):
    """img: (H, W, 3) float in [0, 1] -> augmented, same range."""
    keys = jax.random.split(key, 16)
    h, w, _ = img.shape
    p = params

    def maybe(k, fn, x):
        return jnp.where(jax.random.bernoulli(k, p.freq), fn(x), x)

    # 1. GaussianBlur(sigma ~ U(0, blur_max))
    def blur(x):
        sigma = jax.random.uniform(keys[8], (), maxval=p.blur_max)
        return _gauss_blur(x, sigma)
    img = maybe(keys[0], blur, img)

    # 2. AdditiveGaussianNoise(scale ~ U(0, noise_max), 0-255 units)
    def noise(x):
        kstd, kn, kpc, kb = jax.random.split(keys[9], 4)
        std = jax.random.uniform(kstd, (), maxval=p.noise_max) / 255.0
        shared = jnp.repeat(jax.random.normal(kn, (h, w, 1)), 3, axis=-1)
        per = jax.random.normal(kpc, (h, w, 3))
        n = jnp.where(jax.random.bernoulli(kb, p.color), per, shared)
        return x + std * n
    img = maybe(keys[1], noise, img)

    # 3. CoarseDropout(p ~ U(0, dropout_max),
    #                  size_percent ~ {0.08, 0.14, 0.2})
    def coarse_drop(x):
        kp_, ks_, km = jax.random.split(keys[10], 3)
        dp = jax.random.uniform(kp_, (), maxval=p.dropout_max)

        def mask_at(sp):
            ch = max(int(h * sp), 1)
            cw = max(int(w * sp), 1)
            m = (jax.random.uniform(km, (ch, cw, 1)) > dp).astype(x.dtype)
            return jax.image.resize(m, (h, w, 1), 'nearest')
        branch = jax.random.randint(ks_, (), 0,
                                    len(_COARSE_SIZE_PERCENTS))
        mask = jax.lax.switch(branch, [partial(mask_at, sp)
                                       for sp in _COARSE_SIZE_PERCENTS])
        return x * mask
    img = maybe(keys[2], coarse_drop, img)

    # 4. Dropout(p ~ U(0, dropout_max))
    def drop(x):
        kp_, km, kb = jax.random.split(keys[11], 3)
        dp = jax.random.uniform(kp_, (), maxval=p.dropout_max)
        shared = (jax.random.uniform(km, (h, w, 1)) > dp).astype(x.dtype)
        per = (jax.random.uniform(km, (h, w, 3)) > dp).astype(x.dtype)
        mask = jnp.where(jax.random.bernoulli(kb, p.color), per, shared)
        return x * mask
    img = maybe(keys[3], drop, img)

    # 5. Add(U(-add, add), 0-255 units)
    img = maybe(keys[4],
                lambda x: x + _per_channel(keys[12], p.color,
                                           -p.add_max,
                                           p.add_max) / 255.0, img)
    # 6. Multiply(U(lo, hi))
    img = maybe(keys[5],
                lambda x: x * _per_channel(keys[13], p.color, p.mult_lo,
                                           p.mult_hi), img)
    # 7. ContrastNormalization(U(lo, hi))
    img = maybe(keys[6],
                lambda x: (x - 0.5) * _per_channel(
                    keys[14], p.color, p.contrast_lo,
                    p.contrast_hi) + 0.5, img)

    # 8. Grayscale(alpha ~ U(0, gray_max))
    def gray(x):
        a = jax.random.uniform(keys[15], (), maxval=p.gray_max)
        luma = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]
        return (1 - a) * x + a * luma
    img = maybe(keys[7], gray, img)

    return jnp.clip(img, 0.0, 1.0)


def augment_batch(key, images, params: AugmentParams):
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda k, im: augment_image(k, im, params))(keys,
                                                                images)
