#!/usr/bin/env python
"""Audit traffic-light diagnostics across recorded benchmark runs.

Verifies the uniform fixed-cycle light approximation (engine/lights.py;
PARITY.md divergence #5) is benign: aggregates the per-episode
`total_lights` (lights encountered, reference TrafficTracker semantics at
carla_utils.py:296-323) and `total_lights_ran` columns the benchmark
runner writes to summary.csv, and flags anomalies:

  - expert/autopilot ran-light rate above 10% of episodes. The expert
    brakes for RED only (reference agent.py:95-130 semantics), so a
    route that meets a yellow->red edge exactly at the stop line counts
    as "ran" — verified tick-level (tools/ notes, round 3): every
    audited expert violation crossed on the first red tick. The same
    race exists in the reference; a LOW deterministic rate is expected,
    a high rate means stop-line tables or cycle timing is off;
  - Full-town routes that encounter zero lights (light-heavy towns:
    would mean encounter detection or light placement is broken).

NB: results recorded before round 3 used a tracker that tested EVERY
stop line instead of only the closest light's (the reference semantics,
fixed in engine/env.py round 3), so old artifacts over-count ran-light
by including mid-junction sweeps across cross-street lines.

Usage: python tools/light_audit.py [--results benchmark_results]
"""
from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--results', default='benchmark_results')
    args = ap.parse_args()

    rows = []
    for path in sorted(Path(args.results).glob('*/*/summary.csv')):
        agent = path.parts[-3]
        with open(path) as f:
            for r in csv.DictReader(f):
                if 'total_lights' not in r:
                    continue
                rows.append({
                    'agent': agent, 'suite': r['suite'],
                    'lights': int(r['total_lights']),
                    'ran': int(r['total_lights_ran']),
                    'success': r['success'] == 'True',
                })
    if not rows:
        print('no summary.csv rows found under', args.results)
        return 1

    by = defaultdict(list)
    for r in rows:
        by[(r['agent'], r['suite'])].append(r)

    print(f'{"agent":24s} {"suite":22s} {"eps":>4s} {"lights/ep":>10s} '
          f'{"max":>4s} {"ran":>4s}')
    problems = []
    for (agent, suite), rs in sorted(by.items()):
        n = len(rs)
        mean_l = sum(r['lights'] for r in rs) / n
        max_l = max(r['lights'] for r in rs)
        ran = sum(r['ran'] for r in rs)
        print(f'{agent:24s} {suite:22s} {n:4d} {mean_l:10.2f} '
              f'{max_l:4d} {ran:4d}')
        expert = 'autopilot' in agent
        if expert and ran > 0.10 * n:
            problems.append(f'{agent}/{suite}: expert ran {ran} lights '
                            f'in {n} episodes')
        if suite.startswith('Full') and max_l == 0 and n >= 5:
            problems.append(f'{agent}/{suite}: no lights encountered on '
                            f'any of {n} Full-town routes')

    total_ran = sum(r['ran'] for r in rows)
    total_l = sum(r['lights'] for r in rows)
    print(f'\ntotal: {len(rows)} episodes, {total_l} light encounters, '
          f'{total_ran} ran')
    if problems:
        print('\nANOMALIES:')
        for p in problems:
            print(' -', p)
        return 1
    print('light audit: OK (no anomalies)')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
