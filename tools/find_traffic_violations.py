#!/usr/bin/env python
"""Offline red-light-violation check over benchmark diagnostics.

Capability parity with /root/reference/misc/find_traffic_violations.py
(offline trajectory-vs-light-position checker using the per-town light
coordinate tables): re-tests recorded (x, y) trajectories against the
town's light stop lines and cross-checks the online `ran_light` tracker.

Usage: python tools/find_traffic_violations.py <run_dir> [--town Town01]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def stop_line_crossings(xy: np.ndarray, stop_pos, stop_yaw,
                        lane_half=2.5):
    """Count crossings of any stop line by the polyline xy (N, 2)."""
    crossings = 0
    cos = np.cos(stop_yaw)
    sin = np.sin(stop_yaw)
    rel = xy[:, None, :] - stop_pos[None, :, :]          # (N, L, 2)
    along = rel[..., 0] * cos + rel[..., 1] * sin
    lateral = -rel[..., 0] * sin + rel[..., 1] * cos
    in_lane = np.abs(lateral) < lane_half
    crossed = (along[:-1] <= 0) & (along[1:] > 0) & in_lane[1:]
    return int(crossed.any(axis=1).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('run_dir')
    ap.add_argument('--town', default='Town01')
    args = ap.parse_args()

    from lbc_tpu.maps import build_map_data
    md = build_map_data(args.town)

    rows = []
    for csv in sorted(Path(args.run_dir).glob('**/diagnostics/*.csv')):
        df = pd.read_csv(csv)
        xy = df[['x', 'y']].to_numpy()
        n_cross = stop_line_crossings(xy, md.light_stop_pos,
                                      md.light_stop_yaw)
        online = int(df['ran_light'].sum()) if 'ran_light' in df else -1
        rows.append({'run': csv.stem, 'stop_line_crossings': n_cross,
                     'online_ran_light': online})
    out = pd.DataFrame(rows)
    if out.empty:
        print('no diagnostics CSVs found (run the benchmark with '
              'diagnostics=True)')
        return
    print(out.to_string(index=False))
    print(f'\ntotal crossings: {out.stop_line_crossings.sum()}, '
          f'online ran-light events: {out.online_ran_light.sum()}')


if __name__ == '__main__':
    main()
