"""Replay one benchmark episode with the autopilot and print collision
context: which collision predicate fired (vehicle / walker / static), the
offending actor, and the surrounding ticks' kinematics.

Usage:
  python tools/debug_episode.py --town Town01 --start 162 --target 139 \
      --n_vehicles 20 --n_pedestrians 50 [--weather 1] [--ticks 1200]

Runs on CPU by default (deterministic, no TPU contention).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--start', type=int, required=True)
    ap.add_argument('--target', type=int, required=True)
    ap.add_argument('--weather', type=int, default=1)
    ap.add_argument('--n_vehicles', type=int, default=20)
    ap.add_argument('--n_pedestrians', type=int, default=50)
    ap.add_argument('--ticks', type=int, default=1200)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--platform', default='cpu')
    ap.add_argument('--context', type=int, default=30,
                    help='ticks of context to print before the event')
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.agents.autopilot import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.collision import (ego_vehicle_collision,
                                          ego_walker_collision,
                                          obb_overlap)
    from lbc_tpu.engine.rollout import make_rollout
    from lbc_tpu.constants import EGO_EXTENT_X, EGO_EXTENT_Y, WALKER_EXTENT

    env = DrivingEnv(EnvConfig(town=args.town,
                               n_vehicles=args.n_vehicles,
                               n_pedestrians=args.n_pedestrians))
    st = env.reset_np(seed=args.seed, start=args.start,
                      target=args.target, weather=args.weather)
    batch = stack_states([st])
    if args.n_vehicles or args.n_pedestrians:
        batch = env.warmup(batch, ticks=50)

    def agent_fn(map_data, env_state, obs, agent):
        return expert_step(map_data, env_state, agent)

    def collect(env_state, obs, control, aux):
        return {
            'ego_pos': env_state.ego.pos,
            'ego_yaw': env_state.ego.yaw,
            'speed': obs['speed'],
            'collided': env_state.episode.collided,
            'done': env_state.episode.done,
            'npc_pos': env_state.npc.pos,
            'npc_yaw': env_state.npc.yaw,
            'npc_speed': env_state.npc.speed,
            'npc_active': env_state.npc.active,
            'walker_pos': env_state.walkers.pos,
            'walker_active': env_state.walkers.active,
            'control': control,
        }

    agents = jax.tree.map(lambda x: jnp.stack([x]), expert_init())
    rollout = make_rollout(env, agent_fn, args.ticks, collect=collect)
    final, _, metrics, recs = rollout(batch, agents)
    recs = jax.tree.map(lambda x: np.asarray(x)[:, 0], recs)

    col = recs['collided']
    if not col.any():
        done = recs['done']
        t_end = int(np.argmax(done)) if done.any() else args.ticks
        print(f'no collision; done at t={t_end} '
              f'success={bool(final.episode.success[0])}')
        return

    t_col = int(np.argmax(col))
    print(f'collision at t={t_col}')
    t0 = max(t_col - args.context, 0)
    for t in range(t0, min(t_col + 3, args.ticks)):
        p, y, v = recs['ego_pos'][t], recs['ego_yaw'][t], recs['speed'][t]
        c = recs['control'][t]
        print(f't{t} ego [{p[0]:7.2f} {p[1]:7.2f}] yaw{np.rad2deg(y):6.1f} '
              f'v{v:5.2f} ctrl[s{c[0]:+.2f} t{c[1]:.2f} b{c[2]:.2f}]'
              + (' <-- COLLIDED' if t == t_col else ''))

    # identify the offender at the collision tick
    p, y = recs['ego_pos'][t_col], recs['ego_yaw'][t_col]
    npc_p = recs['npc_pos'][t_col]
    npc_y = recs['npc_yaw'][t_col]
    npc_a = recs['npc_active'][t_col]
    d = np.linalg.norm(npc_p - p, axis=-1)
    for i in np.argsort(d)[:4]:
        if npc_a[i] and d[i] < 10:
            hit = bool(obb_overlap(
                jnp.asarray(p), jnp.asarray(y), EGO_EXTENT_X, EGO_EXTENT_Y,
                jnp.asarray(npc_p[i]), jnp.asarray(npc_y[i]),
                EGO_EXTENT_X, EGO_EXTENT_Y))
            v = recs['npc_speed'][t_col][i]
            print(f'  npc{i} d{d[i]:.1f} pos [{npc_p[i][0]:.1f} '
                  f'{npc_p[i][1]:.1f}] yaw{np.rad2deg(npc_y[i]):.0f} '
                  f'v{v:.2f} overlap={hit}')
            if hit:
                # trajectory of the offender before impact
                for t in range(t0, t_col + 1, 3):
                    op = recs['npc_pos'][t][i]
                    ov = recs['npc_speed'][t][i]
                    print(f'    t{t} npc{i} [{op[0]:.1f} {op[1]:.1f}] '
                          f'v{ov:.2f}')
    wp = recs['walker_pos'][t_col]
    wa = recs['walker_active'][t_col]
    dw = np.linalg.norm(wp - p, axis=-1)
    for i in np.argsort(dw)[:4]:
        if wa[i] and dw[i] < 6:
            print(f'  walker{i} d{dw[i]:.1f} pos [{wp[i][0]:.1f} '
                  f'{wp[i][1]:.1f}]')
            for t in range(t0, t_col + 1, 3):
                print(f'    t{t} walker{i} [{recs["walker_pos"][t][i][0]:.1f}'
                      f' {recs["walker_pos"][t][i][1]:.1f}]')


if __name__ == '__main__':
    main()
