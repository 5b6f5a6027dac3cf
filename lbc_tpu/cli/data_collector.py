"""Collect expert driving episodes (reference: data_collector.py CLI).

Usage:
  python -m lbc_tpu.cli.data_collector --dataset_path data/train \
      --n_episodes 100 --frames_per_episode 1000
"""
from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset_path', required=True)
    ap.add_argument('--n_episodes', type=int, default=50)
    ap.add_argument('--frames_per_episode', type=int, default=4000)
    ap.add_argument('--n_vehicles', type=int, default=0)
    ap.add_argument('--n_pedestrians', type=int, default=0)
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--batch_size', type=int, default=8)
    ap.add_argument('--noise_frames', type=int, default=0,
                    help='noise-phase length; 0 = pure drive '
                         '(data_collector.py:121)')
    ap.add_argument('--rgb', action='store_true',
                    help='also render + store the camera stream')
    args = ap.parse_args()

    from ..data import collect_episodes
    n = collect_episodes(
        args.dataset_path, n_episodes=args.n_episodes,
        frames_per_episode=args.frames_per_episode, seed=args.seed,
        town=args.town, n_vehicles=args.n_vehicles,
        n_pedestrians=args.n_pedestrians, n_noise=args.noise_frames,
        batch_size=args.batch_size, render_rgb=args.rgb)
    print(f'collected {n} episodes into {args.dataset_path}')


if __name__ == '__main__':
    main()
