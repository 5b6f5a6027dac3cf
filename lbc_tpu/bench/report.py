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
        run = csv.parent.name
        m = re.search(r'seed(\d+)', run)
        seed = int(m.group(1)) if m else 0
        for suite, g in df.groupby('suite'):
            rows.append({
                'run': run, 'suite': suite, 'seed': seed,
                'episodes': len(g),
                'successes': int(g['success'].sum()),
                'success_rate': 100.0 * g['success'].mean(),
            })
    return pd.DataFrame(rows)


def format_table(results: pd.DataFrame) -> str:
    lines = [f'{"suite":<28} {"success %":>12} {"episodes":>9} {"seeds":>6}']
    for suite, g in results.groupby('suite'):
        rates = g.groupby('seed')['success_rate'].mean()
        mean = rates.mean()
        std = rates.std(ddof=0) if len(rates) > 1 else 0.0
        total = g['episodes'].sum()
        lines.append(f'{suite:<28} {mean:6.1f} ± {std:4.1f} '
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
