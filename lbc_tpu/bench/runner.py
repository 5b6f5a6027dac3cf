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
from ..utils.fingerprint import engine_fingerprint
from .suites import SuiteConfig

SUMMARY_COLUMNS = ['suite', 'weather', 'start', 'target', 'success',
                   'collided', 'ticks', 'total_lights_ran', 'total_lights',
                   'timeout', 'route_m', 'engine']


def load_resume_rows(summary_csv: Path, fingerprint: str) -> pd.DataFrame:
    """Rows safe to resume from: ONLY those stamped with the current
    engine fingerprint. Anything else (older engine, pre-stamp format) is
    quarantined to summary.stale-<fp>.csv so a re-bench after an engine
    edit provably cannot reuse stale results (the round-3/4 trap)."""
    prev = pd.read_csv(summary_csv)
    if 'engine' not in prev.columns:
        prev['engine'] = 'unstamped'
    stale = prev[prev['engine'] != fingerprint]
    fresh = prev[prev['engine'] == fingerprint]
    if len(stale):
        for fp, g in stale.groupby('engine'):
            quarantine = summary_csv.with_name(f'summary.stale-{fp}.csv')
            g.to_csv(quarantine, index=False)
        print(f'[resume] quarantined {len(stale)} rows from other engine '
              f'version(s) {sorted(stale["engine"].unique())} '
              f'(current {fingerprint})')
        fresh.to_csv(summary_csv, index=False)
    return fresh.reindex(columns=SUMMARY_COLUMNS)

_CMD_NAMES = {1: 'LEFT', 2: 'RIGHT', 3: 'STRAIGHT', 4: 'FOLLOW'}


def _video_collect(env):
    """Per-tick record for run videos: bit-packed BEV + HUD scalars."""
    import jax.numpy as jnp

    from ..render.bev import render_bev_state

    def collect(env_state, obs, control, aux):
        bev = render_bev_state(env.map_data, env_state)
        packed = jnp.zeros(bev.shape[:2], jnp.uint8)
        for c in range(7):
            packed = packed | ((bev[..., c] > 0).astype(jnp.uint8) << c)
        return {'bev': packed, 'speed': obs['speed'],
                'command': obs['command'], 'control': control,
                'collided': obs['collided'],
                'done': env_state.episode.done}
    return collect


def _write_run_video(path, recs, k, title):
    """BEV video with the debug HUD overlay
    (run_benchmark.py:14-163,236 analog)."""
    import cv2

    from ..data.episode_store import unpack_birdview
    from ..utils.video import VideoWriter
    from ..utils.visualize import visualize_birdview

    writer = VideoWriter(path)
    n_ticks = recs['bev'].shape[0]
    for t in range(n_ticks):
        if t > 0 and bool(recs['done'][t, k]):
            break
        canvas = visualize_birdview(
            unpack_birdview(recs['bev'][t, k])).copy()
        steer, throttle, brake = (float(v) for v in recs['control'][t, k])
        lines = [
            title,
            f'tick {t}   speed {float(recs["speed"][t, k]):.1f} m/s',
            f'cmd {_CMD_NAMES.get(int(recs["command"][t, k]), "?")}',
            f'steer {steer:+.2f}  throttle {throttle:.2f}  '
            f'brake {brake:.2f}',
        ]
        if bool(recs['collided'][t, k]):
            lines.append('COLLIDED')
        for i, ln in enumerate(lines):
            cv2.putText(canvas, ln, (4, 14 + 13 * i),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, (255, 255, 255),
                        1, cv2.LINE_AA)
        writer.add(canvas)
    writer.close()


def run_benchmark(agent_factory: Callable, suite: SuiteConfig,
                  log_dir, seed: int = 0, resume: bool = True,
                  batch_size: int = 64, chunk_ticks: int = 1000,
                  max_ticks: Optional[int] = None, warmup_ticks: int = 50,
                  show_progress: bool = True,
                  diagnostics: bool = False,
                  n_videos: int = 0) -> pd.DataFrame:
    """agent_factory(env) -> (agent_step, agent_state_init_fn).

    agent_step(map_data, env_state, obs, agent_state) -> (control, state,
    aux); agent_state_init_fn(batch_size) -> batched agent state.

    `n_videos` > 0 replays the suite's first n tasks in a separate small
    rollout and writes BEV videos with the debug HUD to
    log_dir/videos/<run>.avi (reference writes one per run,
    run_benchmark.py:236; here videos are on demand — the batched main
    sweep never materializes frames).
    """
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    summary_csv = log_dir / 'summary.csv'

    fingerprint = engine_fingerprint()
    finished = pd.DataFrame(columns=SUMMARY_COLUMNS)
    if resume and summary_csv.exists():
        finished = load_resume_rows(summary_csv, fingerprint)

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
                               collect=collect,
                               batched_agent=getattr(agent_step,
                                                     'batched', False))

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
                'engine': fingerprint,
            })
        df = pd.DataFrame(rows, columns=SUMMARY_COLUMNS)
        df.to_csv(summary_csv, index=False)
        if show_progress:
            sr = np.mean([r['success'] for r in rows]) * 100
            print(f'[{suite.name}] {len(rows)} episodes, running success '
                  f'{sr:.1f}%, chunk wall {wall:.1f}s')

    if n_videos > 0:
        video_tasks = [(w, s, t, n) for w, (s, t), n in
                       suite.all_tasks()][:n_videos]
        _record_videos(env, agent_step, agent_init, suite, video_tasks,
                       log_dir / 'videos', seed, warmup_ticks,
                       chunk_ticks=min(chunk_ticks, 500),
                       max_ticks=max_ticks)

    return pd.DataFrame(rows, columns=SUMMARY_COLUMNS)


def _record_videos(env, agent_step, agent_init, suite, tasks, video_dir,
                   seed, warmup_ticks, chunk_ticks, max_ticks=None):
    states, timeouts = [], []
    for weather, start, target, _name in tasks:
        st = env.reset_np(seed=seed, start=start, target=target,
                          weather=weather)
        timeouts.append(float(st.episode.timeout))
        states.append(st)
    batch = stack_states(states)
    if warmup_ticks:
        batch = env.warmup(batch, ticks=warmup_ticks)
    agent_state = agent_init(len(tasks))

    cap = int(max(timeouts)) + 10
    if max_ticks is not None:
        cap = min(cap, max_ticks)
    rollout = make_rollout(env, agent_step, chunk_ticks,
                           collect=_video_collect(env),
                           batched_agent=getattr(agent_step, 'batched',
                                                 False))

    chunks = []
    ticks_done = 0
    while ticks_done < cap:
        batch, agent_state, metrics, recs = rollout(batch, agent_state)
        chunks.append({k: np.asarray(v) for k, v in recs.items()})
        ticks_done += chunk_ticks
        if bool(jnp.all(metrics.done)):
            break
    recs = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    for k, (weather, start, target, name) in enumerate(tasks):
        _write_run_video(video_dir / f'{name}.avi', recs, k,
                         f'{suite.name} {name}')