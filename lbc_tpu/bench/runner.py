"""Benchmark runner: batched episode evaluation -> summary.csv.

Capability parity with /root/reference/benchmark/run_benchmark.py:166-249
(episode loop, resume by (start, target, weather) rows, summary.csv +
per-episode diagnostics), redesigned TPU-first: all episodes of a suite run
*simultaneously* as one vmapped rollout, chunked in time with host-side
early exit once every episode is done — instead of 1 env x 10 Hz x hours.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..engine import stack_states
from ..engine.rollout import make_rollout
from .suites import SuiteConfig

SUMMARY_COLUMNS = ['suite', 'weather', 'start', 'target', 'success',
                   'collided', 'ticks', 'total_lights_ran', 'total_lights',
                   'timeout', 'route_m']


def run_benchmark(agent_factory: Callable, suite: SuiteConfig,
                  log_dir, seed: int = 0, resume: bool = True,
                  batch_size: int = 64, chunk_ticks: int = 1000,
                  max_ticks: Optional[int] = None, warmup_ticks: int = 50,
                  show_progress: bool = True,
                  diagnostics: bool = False) -> pd.DataFrame:
    """agent_factory(env) -> (agent_step, agent_state_init_fn).

    agent_step(map_data, env_state, obs, agent_state) -> (control, state,
    aux); agent_state_init_fn(batch_size) -> batched agent state.
    """
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    summary_csv = log_dir / 'summary.csv'

    finished = pd.DataFrame(columns=SUMMARY_COLUMNS)
    if resume and summary_csv.exists():
        finished = pd.read_csv(summary_csv)

    tasks = []
    for weather, (start, target), run_name in suite.all_tasks():
        already = len(finished) > 0 and (
            (finished['start'] == start) & (finished['target'] == target)
            & (finished['weather'] == weather)).any()
        if not already:
            tasks.append((weather, start, target, run_name))

    if not tasks:
        return finished

    env = suite.make_env()
    agent_step, agent_init = agent_factory(env)

    rows = list(finished.to_dict('records'))
    for lo in range(0, len(tasks), batch_size):
        chunk = tasks[lo:lo + batch_size]
        states, timeouts, route_ms = [], [], []
        for weather, start, target, _name in chunk:
            st = env.reset_np(seed=seed, start=start, target=target,
                              weather=weather)
            timeouts.append(float(st.episode.timeout))
            route_ms.append(float(st.route.cumdist[st.route.length - 1]))
            states.append(st)
        batch = stack_states(states)
        if warmup_ticks:
            batch = env.warmup(batch, ticks=warmup_ticks)
        agent_state = agent_init(len(chunk))

        cap = int(max(timeouts)) + 10
        if max_ticks is not None:
            cap = min(cap, max_ticks)

        collect = None
        if diagnostics:
            # per-tick diagnostics rows (run_benchmark.py:234,244 analog)
            def collect(env_state, obs, control, aux):  # noqa: F811
                return {
                    'x': obs['position'][0], 'y': obs['position'][1],
                    'speed': obs['speed'],
                    'collided': obs['collided'],
                    'invaded': obs['invaded'],
                    'ran_light': env_state.episode.ran_light,
                    'done': obs['done'],
                }
        rollout = make_rollout(env, agent_step, chunk_ticks,
                               collect=collect)

        t0 = time.time()
        ticks_done = 0
        diag_chunks = []
        while ticks_done < cap:
            batch, agent_state, metrics, recs = rollout(batch, agent_state)
            if diagnostics:
                diag_chunks.append(
                    {k: np.asarray(v) for k, v in recs.items()})
            ticks_done += chunk_ticks
            if bool(jnp.all(metrics.done)):
                break
        wall = time.time() - t0

        if diagnostics and diag_chunks:
            diag_dir = log_dir / 'diagnostics'
            diag_dir.mkdir(exist_ok=True)
            full = {k: np.concatenate([c[k] for c in diag_chunks])
                    for k in diag_chunks[0]}
            for k2, (weather, start, target, name) in enumerate(chunk):
                alive = ~full['done'][:, k2]
                n = int(alive.sum()) + 1
                pd.DataFrame({key: full[key][:n, k2]
                              for key in full}).to_csv(
                    diag_dir / f'{name}.csv', index=False)

        done = np.asarray(metrics.done)
        success = np.asarray(metrics.success)
        collided = np.asarray(metrics.collided)
        ticks = np.asarray(metrics.ticks)
        ran = np.asarray(metrics.ran_lights)
        total_lights = np.asarray(batch.episode.total_lights)

        for k, (weather, start, target, _name) in enumerate(chunk):
            rows.append({
                'suite': suite.name, 'weather': weather, 'start': start,
                'target': target,
                'success': bool(success[k] and done[k]),
                'collided': bool(collided[k]), 'ticks': int(ticks[k]),
                'total_lights_ran': int(ran[k]),
                'total_lights': int(total_lights[k]),
                'timeout': timeouts[k], 'route_m': route_ms[k],
            })
        df = pd.DataFrame(rows, columns=SUMMARY_COLUMNS)
        df.to_csv(summary_csv, index=False)
        if show_progress:
            sr = np.mean([r['success'] for r in rows]) * 100
            print(f'[{suite.name}] {len(rows)} episodes, running success '
                  f'{sr:.1f}%, chunk wall {wall:.1f}s')

    return pd.DataFrame(rows, columns=SUMMARY_COLUMNS)
