#!/usr/bin/env python
"""Lockstep world/sensor ticks (reference: misc/synchronous_mode.py).

Upstream needs a CarlaSyncMode context manager to force the server and
its sensor streams into lockstep and a frame-id queue to re-align them.
In lbc-tpu that machinery has nothing to do: the world IS a function —
state_{t+1} = step(state_t) — and a sensor is a pure render of the
state, so world and sensors are synchronous and deterministic by
construction. This example proves it: two replays of the same seed
produce bitwise-identical camera frames.

    python examples/synchronous_mode.py --ticks 30
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--ticks', type=int, default=30)
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.render.camera import render_camera_state

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=15,
                               n_pedestrians=30))

    @jax.jit
    def tick(state, agent):
        control, agent, _ = expert_step(env.map_data, state, agent)
        state, _ = env.step(state, control)
        return state, agent, render_camera_state(env.map_data, state)

    def replay():
        state = env.reset_np(seed=9, start=10, target=70)
        agent = expert_init()
        frames = []
        for _ in range(args.ticks):
            state, agent, cam = tick(state, agent)
            frames.append(np.asarray(cam))
        return np.stack(frames)

    a, b = replay(), replay()
    assert (a == b).all(), 'replays diverged — determinism broken'
    print(f'{args.ticks} lockstep ticks, {a.shape[0]} camera frames, '
          f'replay bitwise-identical: True')
    return True


if __name__ == '__main__':
    main()
