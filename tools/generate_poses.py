#!/usr/bin/env python
"""Generate benchmark pose files for our spawn tables.

The reference's pose files index CARLA's spawn-point table, which only the
CARLA server can produce; our towns have their own deterministic spawn
tables (lbc_tpu.maps.roadnet). This tool regenerates pose pairs with the
same *route semantics* as the CoRL2017 / NoCrash suites
(benchmark/corl2017/096, benchmark/carla100/096):

* straight: 24 pairs whose planned route contains no turn commands
* turn:     25 pairs with at least one LEFT/RIGHT and moderate length
* full:     25 long navigation pairs (multiple turns)
* nocrash:  25 long navigation pairs (separate draw)

Writes lbc_tpu/bench/poses/{corl2017,carla100}/<suite>_<town>.txt in the
reference's two-ints-per-line format (goal_suite.py:14-19).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from lbc_tpu.constants import CMD_LEFT, CMD_RIGHT  # noqa: E402
from lbc_tpu.maps import get_roadnet  # noqa: E402


def route_stats(net, i, j):
    try:
        pts, cmds = net.plan_route(net.spawn_pos[i], net.spawn_pos[j])
    except ValueError:
        return None
    length = float(np.hypot(*np.diff(pts, axis=0).T).sum())
    n_turns = int(np.sum((np.diff((np.isin(cmds, [CMD_LEFT, CMD_RIGHT]))
                                  .astype(int)) == 1)))
    has_turn = bool(np.any(np.isin(cmds, [CMD_LEFT, CMD_RIGHT])))
    return length, n_turns, has_turn


def pick(net, rng, n, pred, max_tries=20000):
    out, seen = [], set()
    ns = len(net.spawn_pos)
    for _ in range(max_tries):
        i, j = rng.randint(0, ns, 2)
        if i == j or (i, j) in seen:
            continue
        st = route_stats(net, i, j)
        if st is None:
            continue
        if pred(*st):
            out.append((i, j))
            seen.add((i, j))
            if len(out) == n:
                return out
    raise RuntimeError(f'only found {len(out)}/{n} pairs')


def main():
    out_root = Path(__file__).resolve().parents[1] / 'lbc_tpu' / 'bench' / \
        'poses'
    for town in ('Town01', 'Town02'):
        net = get_roadnet(town)
        rng = np.random.RandomState(2017)
        suites = {
            ('corl2017', 'straight'): (24, lambda L, t, h:
                                       not h and 80 < L < 250),
            ('corl2017', 'turn'): (25, lambda L, t, h:
                                   h and t <= 2 and 100 < L < 350),
            ('corl2017', 'full'): (25, lambda L, t, h:
                                   t >= 2 and 300 < L < 1500),
            ('carla100', 'nocrash'): (25, lambda L, t, h:
                                      t >= 2 and 300 < L < 1500),
        }
        for (bench, suite), (n, pred) in suites.items():
            pairs = pick(net, rng, n, pred)
            d = out_root / bench
            d.mkdir(parents=True, exist_ok=True)
            path = d / f'{suite}_{town}.txt'
            path.write_text('\n'.join(f'{i} {j}' for i, j in pairs) + '\n')
            lens = [route_stats(net, i, j)[0] for i, j in pairs]
            print(f'{path.name}: {len(pairs)} pairs, route '
                  f'{min(lens):.0f}-{max(lens):.0f} m')


if __name__ == '__main__':
    main()
