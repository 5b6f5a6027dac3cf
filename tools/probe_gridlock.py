"""Categorize WHY each stopped NPC is stopped in a gridlocked dense
episode (companion to detect_gridlock.py). Replays one episode recording
NPC state + light states, then recomputes the hazard predicates from
engine/npc.py in numpy at sample ticks and prints a blocking-reason
histogram: red light / leader vehicle (cone) / head-on corridor /
imminent (junction) / walker / none-of-these (entry hold or a bug).
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
    ap.add_argument('--ticks', type=int, default=600)
    ap.add_argument('--seed', type=int, default=7)
    ap.add_argument('--samples', type=int, nargs='*',
                    default=[0, 10, 50, 200, 599])
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import numpy as np

    from lbc_tpu.cli.benchmark_agent import expert_factory
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.npc import NPC_IMMINENT, NPC_PROXIMITY
    from lbc_tpu.engine.rollout import make_rollout

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.n_vehicles,
                               n_pedestrians=args.n_pedestrians))
    n_spawn = int(env.map_np.spawn_pos.shape[0])
    rng = np.random.RandomState(args.seed)
    s, t = rng.choice(n_spawn, 2, replace=False)
    st = env.reset_np(seed=args.seed, start=int(s), target=int(t), weather=1)
    batch = stack_states([st])
    batch = env.warmup(batch, ticks=50)

    agent_step, agent_init = expert_factory(env)

    def collect(env_state, obs, control, aux):
        return {'npc_pos': env_state.npc.pos, 'npc_yaw': env_state.npc.yaw,
                'npc_speed': env_state.npc.speed, 'npc_wp': env_state.npc.wp,
                'npc_active': env_state.npc.active,
                'ego_pos': env_state.ego.pos, 'ego_yaw': env_state.ego.yaw,
                'light_t0': env_state.episode.light_t0,
                'tick': env_state.episode.tick,
                'walker_pos': env_state.walkers.pos,
                'walker_active': env_state.walkers.active}

    rollout = make_rollout(env, agent_step, args.ticks, collect=collect)
    _, _, _, recs = rollout(batch, agent_init(1))
    r = {k: np.asarray(v)[:, 0] for k, v in recs.items()}

    md = env.map_np
    wpj = np.asarray(md.wp_junction)
    stop_pos = np.asarray(md.light_stop_pos)
    stop_yaw = np.asarray(md.light_stop_yaw)
    road = np.asarray(md.road_raster)

    def ydiff(a, b):
        return np.abs((np.degrees(b - a) + 180) % 360 - 180)

    def within_ahead(tgt, p, y, dist, half_deg):
        d = tgt - p
        norm = np.linalg.norm(d, axis=-1)
        ang = ydiff(y, np.arctan2(d[:, 1], d[:, 0]))
        return (norm > 1e-3) & (norm < dist) & (ang < half_deg)

    for tick in args.samples:
        if tick >= args.ticks:
            continue
        pos, yaw = r['npc_pos'][tick], r['npc_yaw'][tick]
        speed, wp = r['npc_speed'][tick], r['npc_wp'][tick]
        act = r['npc_active'][tick]
        import jax.numpy as jnp
        from lbc_tpu.engine.lights import light_states
        ls = np.asarray(light_states(
            jnp.asarray(md.light_junction), jnp.asarray(md.light_phase),
            jnp.asarray(md.junction_n_phases),
            jnp.asarray(r['light_t0'][tick]),
            jnp.asarray(r['tick'][tick])))
        all_pos = np.concatenate([pos, r['ego_pos'][tick][None]], 0)
        all_yaw = np.concatenate([yaw, [r['ego_yaw'][tick]]], 0)
        all_act = np.concatenate([act, [True]])
        all_speed = np.concatenate([speed, [10.0]])
        all_stopped = all_speed < 0.3
        cats = {'light': 0, 'leader': 0, 'imminent': 0, 'headon': 0,
                'walker': 0, 'hold/other': 0}
        wpos = r['walker_pos'][tick]
        wact = r['walker_active'][tick]
        road = np.asarray(md.road_raster)
        from lbc_tpu.constants import PIXELS_PER_METER
        woff = np.asarray(md.world_offset)
        n_stop = 0
        in_j_ct = 0
        for i in range(pos.shape[0]):
            if not act[i] or speed[i] >= 0.3:
                continue
            n_stop += 1
            p, y = pos[i], yaw[i]
            my_j = wpj[wp[i]] >= 0
            in_j_ct += int(my_j)
            others = all_act.copy()
            others[i] = False
            same_dir = ydiff(y, all_yaw) <= 150.0
            ahead = within_ahead(all_pos, p, y, NPC_PROXIMITY, 45.0)
            imminent = within_ahead(all_pos, p, y, NPC_IMMINENT, 60.0)
            cone = np.where(my_j & all_stopped, imminent, ahead)
            dv = all_pos - p
            fx = dv[:, 0] * np.cos(y) + dv[:, 1] * np.sin(y)
            lat = -dv[:, 0] * np.sin(y) + dv[:, 1] * np.cos(y)
            headon = (~same_dir) & (fx > 0) & (fx < 6) & (np.abs(lat) < 1.8)
            rel = p - stop_pos
            cs, sn = np.cos(stop_yaw), np.sin(stop_yaw)
            along = rel[:, 0] * cs + rel[:, 1] * sn
            lateral = -rel[:, 0] * sn + rel[:, 1] * cs
            lred = np.any((along > -NPC_PROXIMITY) & (along < 0.5)
                          & (np.abs(lateral) < 2.6)
                          & (ydiff(y, stop_yaw) < 60.0) & (ls == 2))
            if lred:
                cats['light'] += 1
            elif np.any(same_dir & cone & others & ~(my_j & all_stopped)):
                cats['leader'] += 1
            elif np.any(same_dir & cone & others):
                cats['imminent'] += 1
            elif np.any(headon & others):
                cats['headon'] += 1
            else:
                dw = np.linalg.norm(wpos - p, axis=-1)
                degree = 162.0 / (np.clip(dw, 1.5, 10.5) + 0.3)
                angW = ydiff(y, np.arctan2((wpos - p)[:, 1],
                                           (wpos - p)[:, 0]))
                pxw = np.round((wpos - woff) * PIXELS_PER_METER)
                hh, ww = road.shape
                cxw = np.clip(pxw[:, 0].astype(int), 0, ww - 1)
                cyw = np.clip(pxw[:, 1].astype(int), 0, hh - 1)
                on_road = road[cyw, cxw] > 0
                wlk = np.any((dw < NPC_PROXIMITY) & (angW < degree)
                             & on_road & wact)
                if wlk:
                    cats['walker'] += 1
                else:
                    cats['hold/other'] += 1
        greens = int((ls == 0).sum())
        print(f't={tick:4d} stopped={n_stop:3d} in_junction={in_j_ct:2d} '
              f'lights_green={greens:2d}/{ls.shape[0]} reasons={cats}')

    # --- deadlock-core analysis at the final sampled tick ---
    tick = max([t for t in args.samples if t < args.ticks])
    pos, yaw = r['npc_pos'][tick], r['npc_yaw'][tick]
    speed, wp = r['npc_speed'][tick], r['npc_wp'][tick]
    act = r['npc_active'][tick]
    edges = find_cycles(pos, yaw, speed, wp, act, wpj, np,
                        NPC_PROXIMITY, NPC_IMMINENT)
    # Tarjan SCC over stopped nodes
    idx = {}
    low = {}
    onstk = set()
    stk = []
    sccs = []
    counter = [0]
    import sys as _sys
    _sys.setrecursionlimit(10000)

    def strong(v):
        idx[v] = low[v] = counter[0]; counter[0] += 1
        stk.append(v); onstk.add(v)
        for w in edges.get(v, []):
            if w not in edges:
                continue
            if w not in idx:
                strong(w); low[v] = min(low[v], low[w])
            elif w in onstk:
                low[v] = min(low[v], idx[w])
        if low[v] == idx[v]:
            comp = []
            while True:
                w = stk.pop(); onstk.discard(w); comp.append(w)
                if w == v:
                    break
            if len(comp) > 1:
                sccs.append(comp)

    for v in list(edges):
        if v not in idx:
            strong(v)
    print(f'final tick {tick}: {len(sccs)} mutual-block cycles')
    # roots: stopped NPCs with no stopped vehicle blockers — why stopped?
    import jax.numpy as jnp
    from lbc_tpu.engine.lights import light_states
    ls = np.asarray(light_states(
        jnp.asarray(md.light_junction), jnp.asarray(md.light_phase),
        jnp.asarray(md.junction_n_phases),
        jnp.asarray(r['light_t0'][tick]), jnp.asarray(r['tick'][tick])))
    for i, bl in sorted(edges.items()):
        if bl:
            continue
        p, y = pos[i], yaw[i]
        rel = p - stop_pos
        cs, sn = np.cos(stop_yaw), np.sin(stop_yaw)
        along = rel[:, 0] * cs + rel[:, 1] * sn
        lateral = -rel[:, 0] * sn + rel[:, 1] * cs
        zone = (along > -NPC_PROXIMITY) & (along < 0.5) \
            & (np.abs(lateral) < 2.6) & (ydiff(y, stop_yaw) < 60.0)
        red = zone & (ls == 2)
        lid = np.nonzero(red)[0]
        # blocked by the (moving or stopped) ego?
        ep, ey = r['ego_pos'][tick], r['ego_yaw'][tick]
        dv = ep - p
        nrm = np.linalg.norm(dv)
        angE = ydiff(y, np.arctan2(dv[1], dv[0]))
        ego_block = (nrm < NPC_PROXIMITY) & (angE < 45)
        print(f'  root npc{i} pos {p.round(1)} yaw '
              f'{np.degrees(y):.0f} junction={wpj[wp[i]] >= 0} '
              f'red_light={lid.tolist()} ego_block={bool(ego_block)}')
    for comp in sccs[:8]:
        print('  CYCLE:', [(int(i), pos[i].round(1).tolist(),
                            round(float(np.degrees(yaw[i])), 0),
                            bool(wpj[wp[i]] >= 0)) for i in comp])




def find_cycles(pos, yaw, speed, wp, act, wpj, np, NPC_PROXIMITY,
                NPC_IMMINENT):
    """Blocked-by graph among stopped NPCs; SCCs = permanent deadlocks."""
    def ydiff(a, b):
        return np.abs((np.degrees(b - a) + 180) % 360 - 180)
    n = pos.shape[0]
    stopped = (speed < 0.3) & act
    edges = {}
    for i in range(n):
        if not stopped[i]:
            continue
        p, y = pos[i], yaw[i]
        my_j = wpj[wp[i]] >= 0
        d = pos - p
        norm = np.linalg.norm(d, axis=-1)
        ang = ydiff(y, np.arctan2(d[:, 1], d[:, 0]))
        ahead = (norm > 1e-3) & (norm < NPC_PROXIMITY) & (ang < 45.0)
        imminent = (norm > 1e-3) & (norm < NPC_IMMINENT) & (ang < 60.0)
        same_dir = ydiff(y, yaw) <= 150.0
        cone = np.where(my_j & stopped, imminent, ahead)
        fx = d[:, 0] * np.cos(y) + d[:, 1] * np.sin(y)
        lat = -d[:, 0] * np.sin(y) + d[:, 1] * np.cos(y)
        headon = (~same_dir) & (fx > 0) & (fx < 6) & (np.abs(lat) < 1.8)
        blockers = np.nonzero(((same_dir & cone) | headon) & stopped
                              & act)[0]
        edges[i] = [j for j in blockers if j != i]
    return edges


if __name__ == '__main__':
    main()
