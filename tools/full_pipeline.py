#!/usr/bin/env python
"""Full-scale privileged pipeline (reference scale, BASELINE config 1+3).

Collects a traffic mix at the reference's data budget (~200k frames,
/root/reference/data_collector.py:263-266 defaults 100 vehicles / 250
pedestrians; README.md:157-166), trains the privileged model to the
val-loss < 5e-3 target (README.md:168), and leaves benchmarking to
lbc_tpu.cli.benchmark_agent.

Usage: nohup python tools/full_pipeline.py > /tmp/priv_full.log 2>&1 &
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def route_pairs(town: str, n_pairs: int, max_len: float, seed: int = 7):
    """Spawn-point pairs whose planned route length fits the budget."""
    import numpy as np

    from lbc_tpu.maps import get_roadnet
    net = get_roadnet(town)
    rng = np.random.RandomState(seed)
    pairs = []
    n_spawn = len(net.spawn_pos)
    tries = 0
    while len(pairs) < n_pairs and tries < n_pairs * 60:
        tries += 1
        i, j = rng.randint(0, n_spawn, 2)
        if i == j:
            continue
        try:
            pts, _ = net.plan_route(net.spawn_pos[i], net.spawn_pos[j],
                                    start_yaw=net.spawn_yaw[i])
        except ValueError:
            continue
        L = np.hypot(*np.diff(pts, axis=0).T).sum()
        if 80 < L < max_len:
            pairs.append((i, j))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--workdir', default='ckpts/priv_full')
    ap.add_argument('--frames', type=int, default=2000)
    ap.add_argument('--epochs', type=int, default=64)
    ap.add_argument('--samples', type=int, default=250)
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--skip-collect', action='store_true')
    ap.add_argument('--skip-train', action='store_true')
    args = ap.parse_args()

    work = Path(args.workdir)
    data_dir = work / 'data'
    val_dir = work / 'data_val'
    ckpt_dir = work / 'priv'

    # ---- 1. collect: traffic mix at reference budget --------------------
    # (episodes, vehicles, walkers, avg-speed m/s for the route-length cap)
    tranches = [
        ('dense',   40, 100, 250, 1.8, 11),
        ('regular', 40,  20,  50, 2.5, 22),
        ('empty',   32,   0,   0, 3.2, 33),
    ]
    if not args.skip_collect:
        from lbc_tpu.data import collect_episodes
        for name, n_ep, nv, nw, v_avg, seed in tranches:
            pairs = route_pairs('Town01', 48,
                                max_len=args.frames * 0.1 * v_avg,
                                seed=seed)
            t0 = time.time()
            n = collect_episodes(
                data_dir, n_episodes=n_ep,
                frames_per_episode=args.frames, seed=seed,
                n_vehicles=nv, n_pedestrians=nw,
                batch_size=16, pose_pairs=pairs)
            print(f'[collect:{name}] {n} episodes ({nv}v/{nw}p) in '
                  f'{time.time() - t0:.0f}s', flush=True)
        # held-out validation set (regular traffic, unseen poses)
        pairs = route_pairs('Town01', 24, max_len=args.frames * 0.1 * 2.5,
                            seed=99)
        n = collect_episodes(val_dir, n_episodes=8,
                             frames_per_episode=args.frames, seed=99,
                             n_vehicles=20, n_pedestrians=50,
                             batch_size=8, pose_pairs=pairs)
        print(f'[collect:val] {n} episodes', flush=True)

    # ---- 2. train privileged --------------------------------------------
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
            'resume': True,
            'model_args': {'model': 'birdview_dian',
                           'backbone': 'resnet18', 'input_channel': 7,
                           'n_step': 5},
            'agent_args': {'steer_points': {'1': 3, '2': 2, '3': 2,
                                            '4': 2}},
            'data_args': {'dataset_dir': str(data_dir),
                          'val_dataset_dir': str(val_dir),
                          'gap': 5, 'angle_jitter': 5, 'crop_x_jitter': 5,
                          'crop_y_jitter': 5, 'max_frames': None,
                          'cmd_biased': True},
            'optimizer_args': {'lr': args.lr},
        }
        t0 = time.time()
        train(config)
        print(f'[train] done in {time.time() - t0:.0f}s', flush=True)
    print('[full_pipeline] DONE', flush=True)


if __name__ == '__main__':
    main()
