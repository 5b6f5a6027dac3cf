"""Decompose the privileged net's inference time: backbone vs head vs
deconv implementation (VERDICT r5 perf item: net+ctrl is the largest
slice at ~29 us/env-step).

Times, at batch 1024 bf16 on the attached device:
  * full BirdviewPolicy.apply
  * backbone (resnet18) alone
  * head (velocity fusion + deconv x3 + branches) alone
  * the deconv stack alone, as nn.ConvTranspose vs the phase-decomposed
    equivalent (conv + depth_to_space)

Usage: python tools/profile_net.py [--batch 1024] [--iters 50]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *args, iters=50):
    """Best-of-3 trials (contention-robust), full device sync per trial."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--iters', type=int, default=50)
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from flax import linen as nn

    from lbc_tpu.models import BirdviewPolicy, one_hot_command
    from lbc_tpu.models.resnet import get_resnet

    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    bev = jax.random.uniform(key, (B, 192, 192, 7), dt)
    speed = jnp.ones((B,), dt)
    cmd = one_hot_command(jnp.ones((B,), jnp.int32)).astype(dt)

    model = BirdviewPolicy(dtype=dt)
    variables = model.init(key, bev[:1].astype(jnp.float32),
                           speed[:1].astype(jnp.float32),
                           cmd[:1].astype(jnp.float32))
    variables = jax.tree.map(
        lambda x: x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, variables)

    full = jax.jit(lambda v, b, s, c: model.apply(v, b, s, c))
    t_full = timeit(full, variables, bev, speed, cmd, iters=args.iters)
    print(f'full net : {t_full*1e3:8.2f} ms/batch '
          f'({t_full/B*1e6:6.2f} us/env)')

    conv, _ = get_resnet('resnet18', bias_first=False, dtype=dt)
    bb_vars = {
        'params': variables['params']['ResNetFeatures_0'],
        'batch_stats': variables['batch_stats']['ResNetFeatures_0'],
    }
    backbone = jax.jit(lambda v, b: conv.apply(v, b))
    t_bb = timeit(backbone, bb_vars, bev, iters=args.iters)
    print(f'backbone : {t_bb*1e3:8.2f} ms/batch ({t_bb/B*1e6:6.2f} us/env)')
    print(f'head     : {(t_full-t_bb)*1e3:8.2f} ms/batch (by difference)')

    # --- deconv stack alone: ConvTranspose vs phase-decomposed ----------
    feat = jax.random.uniform(key, (B, 6, 6, 640), dt)

    class DeconvT(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, ch in enumerate((256, 128, 64)):
                x = nn.ConvTranspose(ch, (3, 3), strides=(2, 2),
                                     padding='SAME', dtype=dt,
                                     name=f'deconv{i + 1}')(x)
                x = nn.relu(x)
            return x

    dt_model = DeconvT()
    dvars = dt_model.init(key, feat[:1])
    f_ct = jax.jit(lambda v, x: dt_model.apply(v, x))
    t_ct = timeit(f_ct, dvars, feat, iters=args.iters)
    print(f'deconv x3 (ConvTranspose) : {t_ct*1e3:8.2f} ms/batch '
          f'({t_ct/B*1e6:6.2f} us/env)')

    from lbc_tpu.models.layers import conv_transpose_s2_same

    def phase_apply(v, x):
        for i in range(3):
            p = v['params'][f'deconv{i + 1}']
            b = p.get('bias')
            x = conv_transpose_s2_same(x, p['kernel'].astype(x.dtype),
                                       None if b is None
                                       else b.astype(x.dtype))
            x = nn.relu(x)
        return x

    f_ph = jax.jit(phase_apply)
    t_ph = timeit(f_ph, dvars, feat, iters=args.iters)
    print(f'deconv x3 (phase-decomp)  : {t_ph*1e3:8.2f} ms/batch '
          f'({t_ph/B*1e6:6.2f} us/env)')

    err = jnp.max(jnp.abs(
        f_ct(dvars, feat).astype(jnp.float32)
        - f_ph(dvars, feat).astype(jnp.float32)))
    print(f'max |ConvTranspose - phase| = {float(err):.3e}')


if __name__ == '__main__':
    main()
