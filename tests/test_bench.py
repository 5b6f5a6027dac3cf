import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from lbc_tpu.bench import (ALL_SUITES, collect_results, format_table,
                           get_suites, make_suite, run_benchmark)
from lbc_tpu.agents import expert_init, expert_step


def test_registry_parity():
    # same suite names as the reference registry (benchmark/__init__.py)
    for name in ['FullTown01-v1', 'NoCrashTown02-v6', 'StraightTown02-v2',
                 'TurnTown01-v3', 'FullTown02-v3-np',
                 'NoCrashTown01_noweather_dense']:
        assert name in ALL_SUITES
    assert set(get_suites('dense')) == {
        'NoCrashTown01-v5', 'NoCrashTown01-v6',
        'NoCrashTown02-v5', 'NoCrashTown02-v6'}
    s = make_suite('NoCrashTown01-v5')
    assert s.n_vehicles == 100 and s.n_pedestrians == 250
    assert s.col_is_failure
    assert len(s.poses) == 25
    assert s.weathers == (1, 3, 6, 8)


def test_all_tasks_enumeration():
    s = make_suite('StraightTown01-v1')
    tasks = list(s.all_tasks())
    assert len(tasks) == 24 * 4
    w, (st, tg), name = tasks[0]
    assert name == f's{st}_t{tg}_w{w}'


def _expert_factory(env):
    def step(m, s, obs, a):
        c, a2, h = expert_step(m, s, a)
        return c, a2, h

    def init(b):
        return jax.tree.map(lambda x: jnp.stack([x] * b), expert_init())
    return step, init


def test_run_benchmark_small(tmp_path):
    """Expert on 2 straight Town01 episodes end-to-end, with resume."""
    full = make_suite('StraightTown01-v1')
    suite = full.restricted(poses=full.poses[:2], weathers=(1,))

    df = run_benchmark(_expert_factory, suite, tmp_path, seed=0,
                       batch_size=4, chunk_ticks=400,
                       max_ticks=1200, warmup_ticks=5,
                       show_progress=False)
    assert len(df) == 2
    assert df['success'].mean() > 0.49   # expert succeeds on straights
    assert (tmp_path / 'summary.csv').exists()

    # resume: nothing left to run
    df2 = run_benchmark(_expert_factory, suite, tmp_path, seed=0,
                        show_progress=False)
    assert len(df2) == len(df)


def test_run_benchmark_videos(tmp_path):
    """n_videos writes a BEV+HUD .avi per requested run."""
    pytest.importorskip('cv2')
    full = make_suite('StraightTown01-v1')
    suite = full.restricted(poses=full.poses[:1], weathers=(1,))
    run_benchmark(_expert_factory, suite, tmp_path, seed=0,
                  batch_size=2, chunk_ticks=60, max_ticks=120,
                  warmup_ticks=0, show_progress=False, n_videos=1)
    vids = list((tmp_path / 'videos').glob('*.avi'))
    assert len(vids) == 1 and vids[0].stat().st_size > 1000


def test_report_formatting(tmp_path):
    for seed in (0, 1):
        d = tmp_path / f'expert_seed{seed}'
        d.mkdir()
        pd.DataFrame({
            'suite': ['X'] * 4, 'weather': [1] * 4, 'start': range(4),
            'target': range(4), 'success': [True, True, False, True],
            'collided': [False] * 4, 'ticks': [100] * 4,
            'total_lights_ran': [0] * 4, 'total_lights': [1] * 4,
            'timeout': [500.0] * 4, 'route_m': [100.0] * 4,
        }).to_csv(d / 'summary.csv', index=False)
    res = collect_results(tmp_path)
    assert len(res) == 2
    table = format_table(res)
    assert '75.0' in table
