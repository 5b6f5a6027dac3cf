"""Benchmark results table (reference: view_benchmark_results.py:8-51).

Globs <run>/summary.csv files, groups by suite and seed directory name,
prints success-rate mean +/- std across seeds.
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np
import pandas as pd


def collect_results(root) -> pd.DataFrame:
    rows = []
    for csv in sorted(Path(root).glob('**/summary.csv')):
        df = pd.read_csv(csv)
        # runs are laid out <agent>_seed<k>/<suite>/summary.csv; fall back
        # to the parent dir name when flat
        parts = csv.parent.parts
        run = parts[-2] if len(parts) >= 2 else csv.parent.name
        m = re.search(r'seed(\d+)', run)
        seed = int(m.group(1)) if m else 0
        agent = re.sub(r'_?seed\d+', '', run) or run
        for suite, g in df.groupby('suite'):
            rows.append({
                'run': run, 'agent': agent, 'suite': suite, 'seed': seed,
                'episodes': len(g),
                'successes': int(g['success'].sum()),
                'success_rate': 100.0 * g['success'].mean(),
            })
    return pd.DataFrame(rows)


def format_table(results: pd.DataFrame) -> str:
    """Success-rate mean +/- std over seeds, per (agent, suite) — the
    reference's DoubleTable grouping (view_benchmark_results.py:8-40)."""
    lines = [f'{"agent":<18} {"suite":<26} {"success %":>12} '
             f'{"episodes":>9} {"seeds":>6}']
    group_cols = ['agent', 'suite'] if 'agent' in results else ['suite']
    for key, g in results.groupby(group_cols):
        agent, suite = key if len(group_cols) == 2 else ('', key)
        rates = g.groupby('seed')['success_rate'].mean()
        mean = rates.mean()
        std = rates.std(ddof=0) if len(rates) > 1 else 0.0
        total = g['episodes'].sum()
        lines.append(f'{agent:<18} {suite:<26} {mean:6.1f} ± {std:4.1f} '
                     f'{total:>9} {len(rates):>6}')
    return '\n'.join(lines)


def main(root='benchmark_results'):
    res = collect_results(root)
    if res.empty:
        print('no summary.csv files under', root)
        return
    print(format_table(res))


if __name__ == '__main__':
    import sys
    main(*sys.argv[1:])
