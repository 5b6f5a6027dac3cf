#!/usr/bin/env python
"""Markdown results tables vs the reference's published numbers.

Reads benchmark_results/<run>_seed<k>/<suite>/summary.csv trees (the
bench/runner.py layout) and emits, per agent, a markdown table with our
success-rate mean±std over seeds next to the reference number from
BASELINE.md — ready to paste into RESULTS.md. Suites with no reference
row print '—'.

    python tools/make_results_tables.py benchmark_results/stage1_r4 \
        --reference stage1
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

# Host-side pandas job — force the CPU backend BEFORE any lbc_tpu import
# (the bench package pulls in the engine, whose module-scope jnp constants
# would otherwise initialize the tunneled TPU client and contend with a
# live training job; same pattern as tests/conftest.py).
import jax

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Reference per-suite success rates (BASELINE.md; reference README.md
# :213-246 autopilot, :252-280 privileged, :285-316 stage-1, :350-374
# stage-2). Values are 'mean' or 'mean ± std' strings.
REFERENCE = {
    'autopilot': {
        'FullTown01-v1': '100', 'FullTown01-v2': '100',
        'FullTown01-v3': '100', 'FullTown01-v4': '100',
        'FullTown02-v1': '100', 'FullTown02-v2': '100',
        'FullTown02-v3': '100', 'FullTown02-v4': '100',
        'NoCrashTown01-v1': '100.0 ± 0.0', 'NoCrashTown01-v2': '100.0 ± 0.0',
        'NoCrashTown01-v3': '98.7 ± 0.6', 'NoCrashTown01-v4': '99.3 ± 1.2',
        'NoCrashTown01-v5': '86.3 ± 3.2', 'NoCrashTown01-v6': '82.7 ± 6.1',
        'NoCrashTown02-v1': '100.0 ± 0.0', 'NoCrashTown02-v2': '100.0 ± 0.0',
        'NoCrashTown02-v3': '99.0 ± 1.0', 'NoCrashTown02-v4': '98.0 ± 2.0',
        'NoCrashTown02-v5': '60.0 ± 2.6', 'NoCrashTown02-v6': '58.7 ± 7.6',
        'StraightTown01-v1': '100', 'StraightTown01-v2': '100',
        'StraightTown02-v1': '100', 'StraightTown02-v2': '100',
        'TurnTown01-v1': '100', 'TurnTown01-v2': '100',
        'TurnTown02-v1': '100', 'TurnTown02-v2': '100',
    },
    'privileged': {
        'FullTown01-v1': '100', 'FullTown01-v2': '100',
        'FullTown01-v3': '100', 'FullTown01-v4': '100',
        'FullTown02-v1': '100', 'FullTown02-v2': '100',
        'FullTown02-v3': '99', 'FullTown02-v4': '100',
        'NoCrashTown01-v1': '100.0 ± 0.0', 'NoCrashTown01-v2': '100.0 ± 0.0',
        'NoCrashTown01-v3': '96.3 ± 3.1', 'NoCrashTown01-v4': '97.3 ± 3.1',
        'NoCrashTown01-v5': '80.2 ± 4.9', 'NoCrashTown01-v6': '81.3 ± 5.8',
        'NoCrashTown02-v1': '100.0 ± 0.0', 'NoCrashTown02-v2': '100.0 ± 0.0',
        'NoCrashTown02-v3': '95.0 ± 1.0', 'NoCrashTown02-v4': '93.3 ± 2.3',
        'NoCrashTown02-v5': '45.5 ± 8.4', 'NoCrashTown02-v6': '45.3 ± 9.5',
        'StraightTown02-v1': '100', 'StraightTown02-v2': '100',
        'TurnTown02-v1': '100', 'TurnTown02-v2': '100',
    },
    'stage1': {
        'FullTown01-v1': '93', 'FullTown01-v2': '98',
        'FullTown01-v3': '94', 'FullTown01-v4': '96',
        'FullTown02-v1': '94', 'FullTown02-v2': '96',
        'FullTown02-v3': '92', 'FullTown02-v4': '94',
        'NoCrashTown01-v1': '88.3 ± 1.5', 'NoCrashTown01-v2': '91.3 ± 3.1',
        'NoCrashTown01-v3': '74.3 ± 3.8', 'NoCrashTown01-v4': '71.3 ± 4.6',
        'NoCrashTown01-v5': '27.7 ± 3.5', 'NoCrashTown01-v6': '24.7 ± 2.3',
        'NoCrashTown02-v1': '85.0 ± 2.6', 'NoCrashTown02-v2': '80.7 ± 2.3',
        'NoCrashTown02-v3': '64.3 ± 4.0', 'NoCrashTown02-v4': '60.0 ± 4.0',
        'NoCrashTown02-v5': '11.7 ± 2.3', 'NoCrashTown02-v6': '11.3 ± 3.1',
        'StraightTown01-v1': '100', 'StraightTown01-v2': '100',
        'StraightTown02-v1': '100', 'StraightTown02-v2': '100',
        'TurnTown01-v1': '96', 'TurnTown01-v2': '100',
        'TurnTown02-v1': '97', 'TurnTown02-v2': '100',
    },
    'stage2': {
        'FullTown01-v1': '100', 'FullTown01-v2': '100',
        'FullTown01-v3': '100', 'FullTown01-v4': '100',
        'FullTown02-v1': '100', 'FullTown02-v2': '100',
        'FullTown02-v3': '98', 'FullTown02-v4': '98',
        'NoCrashTown01-v1': '99.0 ± 0.0', 'NoCrashTown01-v2': '89.3 ± 3.1',
        'NoCrashTown01-v3': '97.3 ± 1.2', 'NoCrashTown01-v4': '95.3 ± 3.1',
        'NoCrashTown01-v5': '70.0 ± 4.8', 'NoCrashTown01-v6': '62.7 ± 2.3',
        'NoCrashTown02-v1': '99.0 ± 0.0', 'NoCrashTown02-v2': '84.7 ± 3.1',
        'NoCrashTown02-v3': '93.3 ± 2.1', 'NoCrashTown02-v4': '70.0 ± 2.0',
        'NoCrashTown02-v5': '46.1 ± 4.0', 'NoCrashTown02-v6': '32.7 ± 9.5',
    },
}


def suite_key(s):
    """Sort Full < NoCrash < Straight < Turn, then town, then version."""
    return (s.split('Town')[0], s)


def make_table(root, reference=None):
    from lbc_tpu.bench.report import collect_results
    res = collect_results(root)
    if res.empty:
        return f'(no summary.csv under {root})'
    ref = REFERENCE.get(reference, {})
    out = []
    for agent, g in res.groupby('agent'):
        out.append(f'**{agent}** ({root})\n')
        out.append('| Suite | ours | reference | episodes | seeds |')
        out.append('|---|---|---|---|---|')
        for suite in sorted(g['suite'].unique(), key=suite_key):
            gg = g[g['suite'] == suite]
            rates = gg.groupby('seed')['success_rate'].mean()
            mean, n = rates.mean(), len(rates)
            ours = (f'{mean:.1f} ± {rates.std(ddof=0):.1f}' if n > 1
                    else f'{mean:.0f}')
            out.append(f"| {suite} | **{ours}** | {ref.get(suite, '—')} "
                       f"| {gg['episodes'].sum()} | {n} |")
        out.append('')
    return '\n'.join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('roots', nargs='+')
    ap.add_argument('--reference', default=None,
                    choices=[None, *REFERENCE.keys()])
    args = ap.parse_args()
    for root in args.roots:
        print(make_table(root, args.reference))


if __name__ == '__main__':
    main()
