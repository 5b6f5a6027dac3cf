"""Trace one (or a few) closed-loop episodes of a learned agent and print
a per-interval table: position, speed, command, distance-to-goal, control.
The stage-1 triage tool — all round-3 FullTown01-v1 failures were
timeouts, so this shows WHERE progress stops (stall, wrong turn, loop).

Usage:
  python tools/trace_agent.py --model-path ckpts/image_r3/phase1/model-256 \
      --start 44 --target 84 [--weather 1] [--ticks 2000] [--stride 25]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-path', required=True)
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--start', type=int, required=True)
    ap.add_argument('--target', type=int, required=True)
    ap.add_argument('--weather', type=int, default=1)
    ap.add_argument('--n_vehicles', type=int, default=0)
    ap.add_argument('--n_pedestrians', type=int, default=0)
    ap.add_argument('--ticks', type=int, default=2000)
    ap.add_argument('--stride', type=int, default=25)
    ap.add_argument('--seed', type=int, default=2025)
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.cli.benchmark_agent import model_agent_factory
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.rollout import make_rollout

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.n_vehicles,
                               n_pedestrians=args.n_pedestrians))
    st = env.reset_np(seed=args.seed, start=args.start, target=args.target,
                      weather=args.weather)
    batch = stack_states([st])
    if args.n_vehicles or args.n_pedestrians:
        batch = env.warmup(batch, ticks=50)

    agent_step, agent_init = model_agent_factory(args.model_path)(env)
    agent_state0 = agent_init(1)

    goal = np.asarray(env.map_np.spawn_pos[args.target])

    def collect(env_state, obs, control, aux):
        return {'pos': env_state.ego.pos, 'speed': obs['speed'],
                'command': obs['command'], 'control': control,
                'done': obs['done'],
                'route_i': env_state.route.checkpoint_idx}
    collect.batched = getattr(agent_step, 'batched', False)

    rollout = make_rollout(env, agent_step, args.ticks, collect=collect,
                           batched_agent=getattr(agent_step, 'batched',
                                                 False))
    final, _, metrics, recs = rollout(batch, agent_state0)

    pos = np.asarray(recs['pos'])[:, 0]
    speed = np.asarray(recs['speed'])[:, 0]
    cmd = np.asarray(recs['command'])[:, 0]
    ctrl = np.asarray(recs['control'])[:, 0]
    done = np.asarray(recs['done'])[:, 0]
    names = {1: 'L', 2: 'R', 3: 'S', 4: 'F'}
    print(f'goal at {goal.round(1)}')
    for t in range(0, args.ticks, args.stride):
        if t > 0 and done[t - 1]:
            break
        d = np.hypot(*(pos[t] - goal))
        print(f't{t:5d} pos[{pos[t][0]:7.1f} {pos[t][1]:7.1f}] '
              f'v{speed[t]:5.2f} cmd {names.get(int(cmd[t]), "?")} '
              f'goal_d {d:6.1f} '
              f'ctrl[s{ctrl[t][0]:+.2f} t{ctrl[t][1]:.2f} '
              f'b{ctrl[t][2]:.2f}]')
    print('success', bool(np.asarray(metrics.success)[0]),
          'collided', bool(np.asarray(final.episode.collided)[0]),
          'tick', int(np.asarray(final.episode.tick)[0]))
    print('speed: mean %.2f, stopped frac %.2f'
          % (speed[~done].mean(), (speed[~done] < 0.1).mean()))


if __name__ == '__main__':
    main()
