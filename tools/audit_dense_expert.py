"""Audit the dense-traffic expert's "too good" success rates (VERDICT r4).

The round-4 fresh-tree expert scored 100/100/96 on dense NoCrash where the
reference expert scores 86/83/60 — plausible for a deterministic engine
with junction gates, but worth proving the successes are not an artifact.
This rolls dense episodes with the benchmark expert and reports, per tick:

* walker teleports (confinement/stuck rules, engine/walkers.py) split by
  distance to the ego — "walkers teleported out of the ego's path" would
  show up as a spike of near-ego teleports;
* ego motion profile: fraction of ticks braking / stopped, longest
  continuous stop (a permanent ego<->NPC junction hold would show as a
  stop of ~episode length);
* NPC stall profile: how many NPCs are stopped, longest single-NPC stall
  (gridlock artifact = town-wide stalls);
* outcomes (success / collision / timeout).

Usage: python tools/audit_dense_expert.py [--episodes 8] [--ticks 3000]
       [--platform cpu]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument("--n_vehicles", type=int, default=0)
    ap.add_argument("--n_pedestrians", type=int, default=0)
    ap.add_argument('--episodes', type=int, default=8)
    ap.add_argument('--ticks', type=int, default=3000)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    ap.add_argument('--json-out', default=None)
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.bench.suites import make_suite
    from lbc_tpu.engine import stack_states
    from lbc_tpu.engine.rollout import make_rollout

    import dataclasses
    suite = make_suite(f'NoCrash{args.town}-v5')
    # default traffic = the suite's own dense counts; flags override
    suite = dataclasses.replace(
        suite,
        n_vehicles=args.n_vehicles or suite.n_vehicles,
        n_pedestrians=args.n_pedestrians or suite.n_pedestrians)
    env = suite.make_env()

    tasks = list(suite.all_tasks())[:args.episodes]
    states = []
    for weather, (start, target), _name in tasks:
        states.append(env.reset_np(seed=args.seed, start=start,
                                   target=target, weather=weather))
    batch = stack_states(states)
    batch = env.warmup(batch, ticks=50)
    agent0 = jax.tree.map(lambda *x: jnp.stack(x),
                          *[expert_init()] * len(tasks))

    def agent(m, s, obs, a):
        c, a2, braking = expert_step(m, s, a)
        return c, a2, braking

    def collect(env_state, obs, control, braking):
        w = env_state.walkers
        d_ego = jnp.linalg.norm(w.pos - env_state.ego.pos[None], axis=-1)
        return {
            'ego_speed': obs['speed'],
            'braking': braking,
            'done': env_state.episode.done,
            'walker_pos': w.pos,
            'walker_active': w.active,
            'walker_d_ego': d_ego,
            'npc_stopped': jnp.sum((env_state.npc.speed < 0.1)
                                   & env_state.npc.active),
            'npc_speed_mean': jnp.sum(jnp.where(
                env_state.npc.active, env_state.npc.speed, 0.0))
            / jnp.maximum(jnp.sum(env_state.npc.active), 1),
        }

    rollout = make_rollout(env, agent, args.ticks, collect=collect)
    final, _, metrics, recs = rollout(batch, agent0)
    recs = {k: np.asarray(v) for k, v in recs.items()}
    done = np.asarray(metrics.done)
    success = np.asarray(metrics.success)
    collided = np.asarray(metrics.collided)
    ticks = np.asarray(metrics.ticks)

    B = len(tasks)
    report = {'episodes': B,
              'success': int(success.sum()),
              'collided': int(collided.sum()),
              'unfinished': int((~done).sum()),
              'per_episode': []}
    for b in range(B):
        n = int(np.argmax(recs['done'][:, b])) if done[b] else args.ticks
        n = max(n, 1)
        alive = slice(0, n)
        # walker teleports: position jumps > 5 m in one tick (walk speed
        # <= 2 m/s -> 0.2 m/tick; jumps are teleport rules only)
        wp = recs['walker_pos'][alive, b]          # (n, P, 2)
        act = recs['walker_active'][alive, b]
        jump = np.linalg.norm(np.diff(wp, axis=0), axis=-1) > 5.0
        jump &= act[1:] & act[:-1]
        d_at_jump = recs['walker_d_ego'][alive, b][1:][jump]
        stopped = recs['ego_speed'][alive, b] < 0.1
        # longest continuous ego stop
        runs, cur = [], 0
        for sflag in stopped:
            cur = cur + 1 if sflag else 0
            runs.append(cur)
        report['per_episode'].append({
            'task': tasks[b][2],
            'ticks': int(ticks[b]),
            'success': bool(success[b]),
            'collided': bool(collided[b]),
            'walker_teleports': int(jump.sum()),
            'teleports_within_15m_of_ego': int((d_at_jump < 15.0).sum()),
            'teleports_within_30m_of_ego': int((d_at_jump < 30.0).sum()),
            'frac_ticks_braking': float(recs['braking'][alive, b].mean()),
            'frac_ticks_stopped': float(stopped.mean()),
            'longest_stop_s': float(max(runs) / 10.0),
            'npc_stopped_mean': float(recs['npc_stopped'][alive, b].mean()),
            'npc_stopped_max': int(recs['npc_stopped'][alive, b].max()),
            'npc_speed_mean': float(
                recs['npc_speed_mean'][alive, b].mean()),
        })
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.json_out:
        Path(args.json_out).write_text(txt)


if __name__ == '__main__':
    main()
