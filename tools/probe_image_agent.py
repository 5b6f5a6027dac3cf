"""Closed-loop sanity probe for an image-agent checkpoint, CPU-friendly.

Runs a handful of benchmark episodes end to end and reports, per episode,
the outcome plus a traffic-light behavior breakdown: ticks stopped while a
red light governs the ego (correct), ticks stopped with NO red governing
(suspicious — the round-3 stage-1 failure mode was a permanent stop at the
first red that persisted after it turned green), and lights ran. Use it
to validate a freshly distilled student BEFORE burning TPU benchmark time
(the full matrix is ~100 episodes/suite; this is 4).

Usage:
  python tools/probe_image_agent.py --ckpt ckpts/image_r3b/phase1/model-128 \
      [--suite FullTown01-v1] [--episodes 4] [--platform cpu]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--suite', default='FullTown01-v1')
    ap.add_argument('--episodes', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--chunk_ticks', type=int, default=500)
    ap.add_argument('--max_ticks', type=int, default=3000)
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.bench import make_suite
    from lbc_tpu.cli.benchmark_agent import model_agent_factory
    from lbc_tpu.engine import stack_states
    from lbc_tpu.engine.hazards import red_light_hazard
    from lbc_tpu.engine.lights import light_states_md
    from lbc_tpu.engine.rollout import make_rollout

    suite = make_suite(args.suite)
    env = suite.make_env()
    factory = model_agent_factory(args.ckpt)
    agent_step, agent_init = factory(env)

    tasks = [(w, s, t, n) for w, (s, t), n in suite.all_tasks()]
    tasks = tasks[:args.episodes]
    states = [env.reset_np(seed=args.seed, start=s, target=t, weather=w)
              for w, s, t, _ in tasks]
    batch = stack_states(states)
    batch = env.warmup(batch, ticks=50)
    m = env.map_data

    def collect(env_state, obs, control, aux):
        ep = env_state.episode
        lstate = light_states_md(m, ep.light_t0, ep.tick)
        red = red_light_hazard(env_state.ego.pos, env_state.ego.yaw,
                               lstate, m.light_stop_pos, m.light_stop_yaw)
        return {'speed': obs['speed'], 'red': red, 'done': ep.done,
                'x': obs['position'][0], 'y': obs['position'][1],
                'brake': control[2]}

    rollout = make_rollout(env, agent_step, args.chunk_ticks,
                           collect=collect,
                           batched_agent=getattr(agent_step, 'batched',
                                                 False))
    agent_state = agent_init(len(tasks))
    recs_all = []
    ticks = 0
    while ticks < args.max_ticks:
        batch, agent_state, metrics, recs = rollout(batch, agent_state)
        recs_all.append({k: np.asarray(v) for k, v in recs.items()})
        ticks += args.chunk_ticks
        print(f'  ... {ticks} ticks, done='
              f'{int(np.asarray(metrics.done).sum())}/{len(tasks)}',
              flush=True)
        if bool(jnp.all(metrics.done)):
            break
    full = {k: np.concatenate([c[k] for c in recs_all])
            for k in recs_all[0]}

    done = np.asarray(metrics.done)
    success = np.asarray(metrics.success)
    collided = np.asarray(metrics.collided)
    ran = np.asarray(metrics.ran_lights)
    for k, (w, s, t, name) in enumerate(tasks):
        alive = ~full['done'][:, k]
        n = int(alive.sum())
        stopped = full['speed'][:n, k] < 0.3
        red = full['red'][:n, k].astype(bool)
        stop_red = int((stopped & red).sum())
        stop_nored = int((stopped & ~red).sum())
        # longest consecutive stop with no red governing
        runs, cur = 0, 0
        for v in (stopped & ~red):
            cur = cur + 1 if v else 0
            runs = max(runs, cur)
        dist = float(np.hypot(np.diff(full['x'][:n, k]),
                              np.diff(full['y'][:n, k])).sum())
        outcome = ('SUCCESS' if success[k] and done[k] else
                   'COLLIDED' if collided[k] else
                   'TIMEOUT/DNF')
        print(f'{name}: {outcome:12s} ticks={n:5d} driven={dist:6.1f} m '
              f'stop@red={stop_red:4d} stop@NOred={stop_nored:4d} '
              f'(max streak {runs}) lights_ran={int(ran[k])}')


if __name__ == '__main__':
    main()
