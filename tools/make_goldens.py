#!/usr/bin/env python
"""Regenerate the closed-loop golden trajectories under tests/goldens/.

Run ONLY when a behavior change is intended and verified (e.g. retuned
dynamics constants); commit the regenerated .npz together with the
change. tests/test_goldens.py asserts current rollouts stay within a
tight envelope of these traces, so silent physics drift fails CI
(SURVEY.md section 7.4.1 trajectory-validation stand-in — no CARLA
server exists in this environment to record real traces from).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN = Path(__file__).resolve().parents[1] / 'tests' / 'goldens'
# (seed, start, target) expert tasks; Town01, no traffic -> purely the
# dynamics + route follower + controller chain.
TASKS = [(0, 7, 60), (1, 18, 71), (2, 29, 82), (3, 40, 93)]
STEPS = 400
STRIDE = 10


def main():
    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.rollout import make_rollout

    env = DrivingEnv(EnvConfig(town='Town01'))
    states = [env.reset_np(seed=s, start=a, target=b)
              for s, a, b in TASKS]
    batch = stack_states(states)
    agent0 = jax.tree.map(lambda x: jnp.stack([x] * len(TASKS)),
                          expert_init())

    def agent(m, s, obs, a):
        return expert_step(m, s, a)

    def collect(env_state, obs, control, aux):
        return {'pos': env_state.ego.pos, 'yaw': env_state.ego.yaw,
                'speed': env_state.ego.speed}

    rollout = make_rollout(env, agent, STEPS, collect=collect)
    _, _, metrics, recs = rollout(batch, agent0)

    GOLDEN.mkdir(exist_ok=True)
    out = GOLDEN / 'expert_town01.npz'
    np.savez_compressed(
        out,
        tasks=np.asarray(TASKS, np.int32),
        stride=np.asarray(STRIDE),
        pos=np.asarray(recs['pos'][::STRIDE]),
        yaw=np.asarray(recs['yaw'][::STRIDE]),
        speed=np.asarray(recs['speed'][::STRIDE]))
    print(f'wrote {out}: pos {np.asarray(recs["pos"][::STRIDE]).shape}, '
          f'success={np.asarray(metrics.success).tolist()}')


if __name__ == '__main__':
    main()
