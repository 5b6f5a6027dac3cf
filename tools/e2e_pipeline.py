#!/usr/bin/env python
"""End-to-end pipeline validation at reduced scale (BASELINE config 1+3).

collect expert episodes -> train the privileged model -> benchmark it on
CoRL suites. The full-scale equivalents are the cli entry points; this
script wires them together with smaller defaults so one TPU session
produces a driving learned agent.

Usage: python tools/e2e_pipeline.py --episodes 24 --epochs 40
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='ckpts/e2e')
    ap.add_argument('--episodes', type=int, default=24)
    ap.add_argument('--frames', type=int, default=2000)
    ap.add_argument('--epochs', type=int, default=40)
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--samples', type=int, default=120)
    ap.add_argument('--lr', type=float, default=2e-4)
    ap.add_argument('--bench-suite', default='StraightTown01-v1')
    ap.add_argument('--skip-collect', action='store_true')
    ap.add_argument('--skip-train', action='store_true')
    args = ap.parse_args()

    work = Path(args.workdir)
    data_dir = work / 'data'
    ckpt_dir = work / 'priv'

    # ---- 1. collect -----------------------------------------------------
    if not args.skip_collect:
        import numpy as np
        from lbc_tpu.data import collect_episodes
        from lbc_tpu.maps import get_roadnet

        # pose pairs whose routes finish inside the frame budget
        net = get_roadnet('Town01')
        rng = np.random.RandomState(7)
        pairs = []
        n_spawn = len(net.spawn_pos)
        while len(pairs) < 40:
            i, j = rng.randint(0, n_spawn, 2)
            if i == j:
                continue
            try:
                pts, _ = net.plan_route(net.spawn_pos[i],
                                        net.spawn_pos[j],
                                        start_yaw=net.spawn_yaw[i])
            except ValueError:
                continue
            L = np.hypot(*np.diff(pts, axis=0).T).sum()
            if 80 < L < args.frames * 0.1 * 3.0:   # finish at >= 3 m/s avg
                pairs.append((i, j))

        t0 = time.time()
        n = collect_episodes(data_dir, n_episodes=args.episodes,
                             frames_per_episode=args.frames, seed=0,
                             batch_size=8, pose_pairs=pairs)
        print(f'[collect] {n} episodes in {time.time() - t0:.0f}s',
              flush=True)

    # ---- 2. train privileged -------------------------------------------
    if not args.skip_train:
        from lbc_tpu.cli.train_birdview import train
        config = {
            'log_dir': str(ckpt_dir),
            'log_iterations': 100,
            'max_epoch': args.epochs,
            'samples_per_epoch': args.samples,
            'batch_size': args.batch,
            'seed': 0,
            'bf16': False,
            'resume': False,
            'model_args': {'model': 'birdview_dian',
                           'backbone': 'resnet18', 'input_channel': 7,
                           'n_step': 5},
            'agent_args': {'steer_points': {'1': 3, '2': 2, '3': 2,
                                            '4': 2}},
            'data_args': {'dataset_dir': str(data_dir),
                          'val_dataset_dir': str(data_dir),
                          'gap': 5, 'angle_jitter': 5, 'crop_x_jitter': 5,
                          'crop_y_jitter': 5, 'max_frames': None,
                          'cmd_biased': True},
            'optimizer_args': {'lr': args.lr},
        }
        t0 = time.time()
        train(config)
        print(f'[train] done in {time.time() - t0:.0f}s', flush=True)

    # ---- 3. benchmark ----------------------------------------------------
    from lbc_tpu.bench import make_suite, run_benchmark
    from lbc_tpu.cli.benchmark_agent import model_agent_factory
    from lbc_tpu.train.checkpoints import latest_checkpoint

    ckpt = latest_checkpoint(ckpt_dir)
    print(f'[bench] evaluating {ckpt}', flush=True)
    factory = model_agent_factory(str(ckpt))
    suite = make_suite(args.bench_suite)
    df = run_benchmark(factory, suite,
                       work / 'bench' / args.bench_suite, seed=0,
                       batch_size=96, resume=False)
    rate = 100 * df['success'].mean()
    print(json.dumps({'suite': args.bench_suite,
                      'success_rate': round(rate, 1),
                      'episodes': len(df)}))


if __name__ == '__main__':
    main()
