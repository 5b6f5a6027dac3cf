"""Minimal repro for the tunneled-TPU-client host-memory growth.

Round-2 observation: long phase-1 training runs grow host RSS ~7 GB/epoch
(~7 MB/step — about one input batch per step) until the OOM killer fires;
worked around in round 2 by process-chunked training (retired; the
root-cause fix is device-resident training, train/resident.py). This
isolates which layer keeps host mirrors alive:

  python tools/leak_repro.py --variant donate     # train_image pattern
  python tools/leak_repro.py --variant nodonate   # no state donation
  python tools/leak_repro.py --variant donate_in  # donate inputs too
  python tools/leak_repro.py --variant delete     # explicit arr.delete()
  python tools/leak_repro.py --variant const      # same host batch every
                                                  # step (no new transfer)
  python tools/leak_repro.py --variant cpu        # CPU backend control

Prints RSS every N steps; a flat `const` + growing `donate` pins the leak
on per-transfer host buffers rather than the step computation.
"""
from __future__ import annotations

import argparse
import gc
import os


def rss_mb():
    with open('/proc/self/status') as f:
        for line in f:
            if line.startswith('VmRSS'):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variant', default='donate',
                    choices=['donate', 'nodonate', 'donate_in', 'delete',
                             'const', 'cpu'])
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--report_every', type=int, default=20)
    ap.add_argument('--batch', type=int, default=96)
    args = ap.parse_args()

    import jax
    if args.variant == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    import optax

    print(f'variant={args.variant} backend={jax.default_backend()}',
          flush=True)

    # params ~6 M floats; batch mirrors the image pipeline's footprint
    # (96 x 160 x 384 x 3 f32 = 28 MB  +  96 x 192 x 192 uint8)
    rng = np.random.RandomState(0)
    params = {
        'w1': jnp.asarray(rng.randn(3 * 8 * 8, 256).astype(np.float32)),
        'w2': jnp.asarray(rng.randn(256, 256).astype(np.float32)),
        'w3': jnp.asarray(rng.randn(256, 10).astype(np.float32)),
    }
    tx = optax.adam(1e-4)
    opt = tx.init(params)
    state = (params, opt)

    def step(state, batch):
        params, opt = state

        def loss_fn(p):
            x = batch['rgb']
            B = x.shape[0]
            # patchify -> matmul chain: enough FLOPs to engage the device
            x = x[:, :160 // 8 * 8, :384 // 8 * 8, :]
            x = x.reshape(B, 20, 8, 48, 8, 3).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, 20 * 48, 8 * 8 * 3)
            h = jnp.tanh(x @ p['w1'])
            h = jnp.tanh(h @ p['w2'])
            out = jnp.mean(h @ p['w3'], axis=1)
            aux = jnp.mean(batch['bev'].astype(jnp.float32))
            return jnp.mean(out ** 2) + 0.0 * aux

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        return (params, opt), loss

    donate = {'donate': (0,), 'nodonate': (), 'donate_in': (0, 1),
              'delete': (0,), 'const': (0,), 'cpu': (0,)}[args.variant]
    jit_step = jax.jit(step, donate_argnums=donate)

    const_batch = None
    if args.variant == 'const':
        const_batch = {
            'rgb': jnp.asarray(rng.rand(args.batch, 160, 384, 3)
                               .astype(np.float32)),
            'bev': jnp.asarray(rng.randint(
                0, 255, (args.batch, 192, 192), dtype=np.uint8)),
        }

    base = rss_mb()
    print(f'step 0 rss {base:.0f} MB', flush=True)
    for i in range(1, args.steps + 1):
        if const_batch is not None:
            batch = const_batch
        else:
            np_batch = {
                'rgb': rng.rand(args.batch, 160, 384, 3)
                          .astype(np.float32),
                'bev': rng.randint(0, 255, (args.batch, 192, 192),
                                   dtype=np.uint8),
            }
            batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
        state, loss = jit_step(state, batch)
        if args.variant == 'delete':
            jax.block_until_ready(loss)
            for v in batch.values():
                v.delete()
        if i % args.report_every == 0:
            jax.block_until_ready(loss)
            gc.collect()
            print(f'step {i} rss {rss_mb():.0f} MB '
                  f'(+{rss_mb() - base:.0f})', flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
