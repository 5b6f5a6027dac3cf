"""Sweep NPC traffic-flow parameters and measure expert throughput in
dense episodes (ego success / ticks, NPC mean speed, stopped fraction).

Used to tune dense-suite congestion after the mutual-block fix: the
junction entry gate and queue proximity determine how fast light queues
drain, which decides NoCrash v5/v6 timeout rates.

Usage:
  python tools/sweep_traffic.py --platform cpu --episodes 6 --ticks 5000
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

CONFIGS = {
    'baseline': {},                # speed-gap (6.0 + 0.5v) + conflict gate
    'fixed-7.5': {'NPC_GAP_BASE': 7.5, 'NPC_GAP_HEADWAY': 0.0},
    'tight-base': {'NPC_GAP_BASE': 5.5},
    'cap6': {'NPC_JUNCTION_CAP': 6},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--n_vehicles', type=int, default=100)
    ap.add_argument('--n_pedestrians', type=int, default=250)
    ap.add_argument('--ticks', type=int, default=5000)
    ap.add_argument('--episodes', type=int, default=6)
    ap.add_argument('--seed', type=int, default=11)
    ap.add_argument('--configs', nargs='*', default=list(CONFIGS))
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from lbc_tpu.cli.benchmark_agent import expert_factory
    from lbc_tpu.engine import npc as npc_mod
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.rollout import make_rollout

    defaults = {k: getattr(npc_mod, k) for k in
                ('NPC_PROXIMITY', 'NPC_GAP_BASE', 'NPC_GAP_HEADWAY',
                 'NPC_JUNCTION_CAP')}

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.n_vehicles,
                               n_pedestrians=args.n_pedestrians))
    n_spawn = int(env.map_np.spawn_pos.shape[0])

    for name in args.configs:
        overrides = CONFIGS[name]
        for k, v in {**defaults, **overrides}.items():
            setattr(npc_mod, k, v)

        rng = np.random.RandomState(args.seed)
        states = []
        for e in range(args.episodes):
            s, t = rng.choice(n_spawn, 2, replace=False)
            states.append(env.reset_np(seed=args.seed + e, start=int(s),
                                       target=int(t), weather=1))
        batch = stack_states(states)
        batch = env.warmup(batch, ticks=50)
        agent_step, agent_init = expert_factory(env)

        def collect(env_state, obs, control, aux):
            return {'npc_speed': env_state.npc.speed,
                    'npc_active': env_state.npc.active}

        rollout = make_rollout(env, agent_step, args.ticks,
                               collect=collect)
        _, _, metrics, recs = rollout(batch, agent_init(args.episodes))

        speed = np.asarray(recs['npc_speed'])       # (T, E, N)
        act = np.asarray(recs['npc_active'])
        mean_speed = float((speed * act).sum() / np.maximum(act.sum(), 1))
        stopped_frac = float(((speed < 0.3) & act).sum()
                             / np.maximum(act.sum(), 1))
        succ = int(np.asarray(metrics.success).sum())
        done = int(np.asarray(metrics.done).sum())
        coll = int(np.asarray(metrics.collided).sum())
        ticks = np.asarray(metrics.ticks)
        print(f'{name:28s} success {succ}/{args.episodes} done {done} '
              f'collided {coll} '
              f'ticks {ticks.tolist()} npc_speed {mean_speed:.2f} '
              f'stopped {stopped_frac:.2%}', flush=True)

    for k, v in defaults.items():
        setattr(npc_mod, k, v)


if __name__ == '__main__':
    main()
