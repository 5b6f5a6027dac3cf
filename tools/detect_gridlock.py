"""Detect permanent NPC deadlocks (head-on mutual stops, junction
gridlock) in dense-traffic episodes.

The NPC hazard model (engine/npc.py) blocks on opposed traffic inside a
narrow dead-ahead corridor with no stopped-relaxation — two NPCs on
crossing junction connectors could in principle stop facing each other
forever, and the junction-entry gate would then hold everyone else out.
This tool rolls dense episodes with the expert ego and reports NPC pairs
that are mutually head-on AND both stopped for a sustained window, plus
NPCs stopped longer than a threshold anywhere.

Usage:
  python tools/detect_gridlock.py [--town Town01] [--n_vehicles 100] \
      [--ticks 3000] [--episodes 4] [--platform cpu]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--n_vehicles', type=int, default=100)
    ap.add_argument('--n_pedestrians', type=int, default=0)
    ap.add_argument('--ticks', type=int, default=3000)
    ap.add_argument('--episodes', type=int, default=4)
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--stall', type=int, default=600,
                    help='ticks (60 s) stopped = reported as stalled')
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.cli.benchmark_agent import expert_factory
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.rollout import make_rollout

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.n_vehicles,
                               n_pedestrians=args.n_pedestrians))
    n_spawn = int(env.map_np.spawn_pos.shape[0])
    rng = np.random.RandomState(args.seed)
    states = []
    for e in range(args.episodes):
        s, t = rng.choice(n_spawn, 2, replace=False)
        states.append(env.reset_np(seed=args.seed + e, start=int(s),
                                   target=int(t), weather=1))
    batch = stack_states(states)
    batch = env.warmup(batch, ticks=50)

    agent_step, agent_init = expert_factory(env)
    agent_state0 = agent_init(args.episodes)

    def collect(env_state, obs, control, aux):
        return {'npc_pos': env_state.npc.pos, 'npc_yaw': env_state.npc.yaw,
                'npc_speed': env_state.npc.speed,
                'npc_active': env_state.npc.active}

    rollout = make_rollout(env, agent_step, args.ticks, collect=collect)
    _, _, metrics, recs = rollout(batch, agent_state0)
    for e in range(args.episodes):
        print(f'ego episode {e}: done={bool(metrics.done[e])} '
              f'success={bool(metrics.success[e])} '
              f'collided={bool(metrics.collided[e])} '
              f'ticks={int(metrics.ticks[e])}')

    pos = np.asarray(recs['npc_pos'])        # (T, E, N, 2)
    yaw = np.asarray(recs['npc_yaw'])
    speed = np.asarray(recs['npc_speed'])
    active = np.asarray(recs['npc_active'])
    T, E, N = speed.shape
    stopped = (speed < 0.3) & active

    any_bad = False
    for e in range(E):
        # --- sustained stalls: longest consecutive stopped run per NPC ---
        st = stopped[:, e]                    # (T, N)
        run = np.zeros(N, int)
        best = np.zeros(N, int)
        for t in range(T):
            run = np.where(st[t], run + 1, 0)
            best = np.maximum(best, run)
        stalled = np.where(best >= args.stall)[0]
        # exclude end-of-episode parking (stopped through the final tick is
        # still suspicious; report tail separately)
        tail = st[-1] & (run >= args.stall)
        print(f'episode {e}: {len(stalled)} NPCs stalled >= {args.stall} '
              f'ticks (of those, {int(tail.sum())} still stopped at end)')

        # --- mutual head-on pairs at the final tick ---
        p, y = pos[-1, e], yaw[-1, e]
        d = p[None, :, :] - p[:, None, :]     # (N, N, 2) i -> j
        fx = d[..., 0] * np.cos(y)[:, None] + d[..., 1] * np.sin(y)[:, None]
        lat = -d[..., 0] * np.sin(y)[:, None] + d[..., 1] * np.cos(y)[:, None]
        ydiff = np.abs((np.degrees(y[None, :] - y[:, None]) + 180) % 360
                       - 180)
        headon = (ydiff > 150) & (fx > 0) & (fx < 6) & (np.abs(lat) < 1.8)
        both_stopped = st[-1][:, None] & st[-1][None, :]
        act = active[-1, e]
        mutual = headon & headon.T & both_stopped & act[:, None] & act[None, :]
        pairs = [(i, j) for i, j in zip(*np.nonzero(mutual)) if i < j]
        if pairs:
            any_bad = True
            for i, j in pairs:
                # how long has the pair been mutually stopped?
                dur = int(min(run[i], run[j]))
                print(f'  HEAD-ON DEADLOCK npc{i}<->npc{j} at '
                      f'{p[i].round(1)} / {p[j].round(1)} '
                      f'(stopped {dur} ticks)')
        if len(stalled) and not pairs:
            worst = stalled[np.argsort(-best[stalled])][:5]
            for i in worst:
                print(f'  stalled npc{i}: max run {best[i]} ticks, '
                      f'final pos {pos[-1, e, i].round(1)} '
                      f'speed {speed[-1, e, i]:.2f}')
    print('RESULT:', 'DEADLOCK-FOUND' if any_bad else 'no mutual head-on '
          'deadlocks at episode end')


if __name__ == '__main__':
    main()
