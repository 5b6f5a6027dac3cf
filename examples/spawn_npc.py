#!/usr/bin/env python
"""Populate a town with traffic (reference: misc/spawn_npc.py).

Upstream spawns N autopilot vehicles and M walkers through the server
API one actor at a time. Here actor population is a config field: every
NPC lives in one fixed-shape array and all of them advance inside the
single fused env step — spawning 100 vehicles costs the same dispatch
as spawning 1.

    python examples/spawn_npc.py -n 50 -w 80 --ticks 200
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('-n', '--vehicles', type=int, default=50)
    ap.add_argument('-w', '--walkers', type=int, default=80)
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--ticks', type=int, default=200)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.engine import DrivingEnv, EnvConfig

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.vehicles,
                               n_pedestrians=args.walkers))
    state = env.reset_np(seed=3, start=0, target=60)
    print(f'spawned {int(np.sum(np.asarray(state.npc.active)))} vehicles, '
          f'{int(np.sum(np.asarray(state.walkers.active)))} walkers '
          f'in {args.town}')

    # park the ego (zero control) and let the town live around it
    step = jax.jit(lambda s: env.step(s, jnp.array([0.0, 0.0, 1.0]))[0])
    for t in range(args.ticks):
        state = step(state)

    v = np.asarray(state.npc.speed)[np.asarray(state.npc.active)]
    print(f'after {args.ticks} ticks: '
          f'mean NPC speed {v.mean():.2f} m/s, '
          f'moving {(v > 0.5).sum()}/{v.size}')
    return float(v.mean())


if __name__ == '__main__':
    main()
