#!/usr/bin/env python
"""Image-agent pipeline at reduced scale (BASELINE config 2): collect RGB
episodes -> phase-0 camera-space warmup -> phase-1 map-space distillation
-> benchmark the image agent.

Requires a trained privileged teacher (tools/e2e_pipeline.py).

Usage: python tools/image_pipeline.py --teacher ckpts/e2e/priv/model-16
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
    ap.add_argument('--teacher', default='ckpts/e2e/priv/model-16')
    ap.add_argument('--workdir', default='ckpts/image')
    ap.add_argument('--episodes', type=int, default=16)
    ap.add_argument('--frames', type=int, default=1500)
    ap.add_argument('--phase0-epochs', type=int, default=6)
    ap.add_argument('--phase1-epochs', type=int, default=10)
    ap.add_argument('--samples', type=int, default=100)
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--bench-suite', default='StraightTown01-v1')
    ap.add_argument('--skip-collect', action='store_true')
    ap.add_argument('--no-augment', action='store_true')
    ap.add_argument('--skip-phase0', action='store_true')
    ap.add_argument('--skip-phase1', action='store_true')
    args = ap.parse_args()

    work = Path(args.workdir)
    data_dir = work / 'data'

    if not args.skip_collect:
        import numpy as np
        from lbc_tpu.data import collect_episodes
        from lbc_tpu.maps import get_roadnet
        net = get_roadnet('Town01')
        rng = np.random.RandomState(11)
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
            if 80 < L < args.frames * 0.1 * 3.0:
                pairs.append((i, j))
        t0 = time.time()
        n = collect_episodes(data_dir, n_episodes=args.episodes,
                             frames_per_episode=args.frames, seed=1,
                             batch_size=8, pose_pairs=pairs,
                             render_rgb=True)
        print(f'[collect] {n} rgb episodes in {time.time() - t0:.0f}s',
              flush=True)

    from lbc_tpu.cli.train_image import train as train_image

    base = {
        'batch_size': args.batch,
        'samples_per_epoch': args.samples,
        'augment': not args.no_augment,
        'seed': 0,
        'model_args': {'model': 'image_ss', 'backbone': 'resnet34'},
        'teacher_args': {'model_path': args.teacher,
                         'backbone': 'resnet18'},
        'data_args': {'dataset_dir': str(data_dir), 'max_frames': None},
        'optimizer_args': {'lr': 1e-4},
        'camera_args': {'w': 384, 'h': 160, 'fov': 90, 'world_y': 1.4,
                        'fixed_offset': 4.0},
    }

    if not args.skip_phase0:
        cfg0 = dict(base, phase=0, log_dir=str(work / 'phase0'),
                    max_epoch=args.phase0_epochs, speed_noise=0.0,
                    ckpt=None)
        t0 = time.time()
        train_image(cfg0)
        print(f'[phase0] done in {time.time() - t0:.0f}s', flush=True)

    if not args.skip_phase1:
        from lbc_tpu.train.checkpoints import latest_checkpoint
        cfg1 = dict(base, phase=1, log_dir=str(work / 'phase1'),
                    max_epoch=args.phase1_epochs, speed_noise=1.0,
                    ckpt=str(latest_checkpoint(work / 'phase0')))
        t0 = time.time()
        train_image(cfg1)
        print(f'[phase1] done in {time.time() - t0:.0f}s', flush=True)

    from lbc_tpu.bench import make_suite, run_benchmark
    from lbc_tpu.cli.benchmark_agent import model_agent_factory
    from lbc_tpu.train.checkpoints import latest_checkpoint
    ckpt = latest_checkpoint(work / 'phase1')
    print(f'[bench] evaluating image agent {ckpt}', flush=True)
    factory = model_agent_factory(str(ckpt))
    suite = make_suite(args.bench_suite)
    df = run_benchmark(factory, suite, work / 'bench' / args.bench_suite,
                       seed=0, batch_size=96, resume=False)
    print(json.dumps({'suite': args.bench_suite,
                      'agent': 'image_phase1',
                      'success_rate': round(100 * df['success'].mean(), 1),
                      'episodes': len(df)}))


if __name__ == '__main__':
    main()
