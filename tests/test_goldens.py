"""Closed-loop golden-trajectory regression (SURVEY.md section 7.4.1).

The committed traces (tools/make_goldens.py) pin down the full
dynamics + route-follower + PID chain: any change to dynamics constants,
controller gains or routing that shifts the expert's closed-loop path by
more than the envelope below fails here. Regenerate the goldens ONLY
with an intended, verified behavior change.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).parent / 'goldens' / 'expert_town01.npz'

POS_TOL_M = 0.25      # max per-sample position deviation
SPEED_TOL = 0.25      # m/s
YAW_TOL = 0.1         # rad


@pytest.mark.skipif(not GOLDEN.exists(), reason='goldens not generated')
def test_expert_closed_loop_matches_golden():
    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.rollout import make_rollout

    g = np.load(GOLDEN)
    tasks = g['tasks']
    stride = int(g['stride'])
    n_steps = g['pos'].shape[0] * stride

    env = DrivingEnv(EnvConfig(town='Town01'))
    states = [env.reset_np(seed=int(s), start=int(a), target=int(b))
              for s, a, b in tasks]
    batch = stack_states(states)
    agent0 = jax.tree.map(lambda x: jnp.stack([x] * len(tasks)),
                          expert_init())

    def agent(m, s, obs, a):
        return expert_step(m, s, a)

    def collect(env_state, obs, control, aux):
        return {'pos': env_state.ego.pos, 'yaw': env_state.ego.yaw,
                'speed': env_state.ego.speed}

    rollout = make_rollout(env, agent, n_steps, collect=collect)
    _, _, _, recs = rollout(batch, agent0)

    pos = np.asarray(recs['pos'][::stride])
    speed = np.asarray(recs['speed'][::stride])
    yaw = np.asarray(recs['yaw'][::stride])

    dpos = np.linalg.norm(pos - g['pos'], axis=-1).max()
    dspeed = np.abs(speed - g['speed']).max()
    dyaw = np.abs(np.angle(np.exp(1j * (yaw - g['yaw'])))).max()
    assert dpos < POS_TOL_M, f'position drift {dpos:.3f} m'
    assert dspeed < SPEED_TOL, f'speed drift {dspeed:.3f} m/s'
    assert dyaw < YAW_TOL, f'yaw drift {dyaw:.3f} rad'
