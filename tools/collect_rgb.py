#!/usr/bin/env python
"""Full-scale RGB (image-agent) data collection on the CPU backend.

Separate from tools/full_pipeline.py so it can run concurrently with TPU
jobs: camera rendering inside very long fused collect scans has crashed
the TPU worker before (CLAUDE.md), so RGB collection stays on CPU — the
documented workaround — while BEV-only collection and training use the
chip.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='ckpts/image_full/data')
    ap.add_argument('--frames', type=int, default=1500)
    ap.add_argument('--platform', default='cpu', choices=['cpu', 'tpu'],
                    help='tpu is worth probing now that the camera '
                         'composite is argmin-then-gather (the old '
                         '(H,W,K,3) broadcast OOMed the worker)')
    ap.add_argument('--episodes-scale', type=float, default=1.0)
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    from full_pipeline import route_pairs

    from lbc_tpu.data import collect_episodes

    tranches = [
        ('regular', 24, 20, 50, 2.5, 41),
        ('dense', 24, 100, 250, 1.8, 52),
        ('empty', 16, 0, 0, 3.2, 63),
    ]
    for name, n_ep, nv, nw, v_avg, seed in tranches:
        n_ep = max(1, int(round(n_ep * args.episodes_scale)))
        pairs = route_pairs('Town01', 48,
                            max_len=args.frames * 0.1 * v_avg, seed=seed)
        t0 = time.time()
        n = collect_episodes(
            args.out, n_episodes=n_ep, frames_per_episode=args.frames,
            seed=seed, n_vehicles=nv, n_pedestrians=nw, batch_size=8,
            pose_pairs=pairs, render_rgb=True)
        print(f'[collect-rgb:{name}] {n} episodes ({nv}v/{nw}p) in '
              f'{time.time() - t0:.0f}s', flush=True)
    print('[collect_rgb] DONE', flush=True)


if __name__ == '__main__':
    main()
