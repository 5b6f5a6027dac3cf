#!/usr/bin/env python
"""Whole-town 2D map view (reference: misc/no_rendering_mode.py).

Upstream reimplements a 1200-line pygame renderer that polls the server
for every actor transform each frame. Here the town already exists as
5 px/m rasters inside MapData and every actor position is a row of one
array, so the "no rendering" view is: tint the rasters once, then
scatter actor pixels per tick — pure numpy on the host, world stepping
jitted on device.

    python examples/no_rendering_mode.py --ticks 120 --out /tmp/town.avi
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--vehicles', type=int, default=40)
    ap.add_argument('--walkers', type=int, default=60)
    ap.add_argument('--ticks', type=int, default=120)
    ap.add_argument('--every', type=int, default=2,
                    help='render every k-th tick')
    ap.add_argument('--out', default='/tmp/town.avi')
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.engine.lights import light_states
    from lbc_tpu.utils.video import VideoWriter

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.vehicles,
                               n_pedestrians=args.walkers))
    state = env.reset_np(seed=5, start=20, target=110)
    agent = expert_init()
    md = env.map_data

    # static base layer: offroad grey, road dark, lane markings, sidewalk
    road = np.asarray(md.road_raster) > 0
    lane = np.asarray(md.lane_raster) > 0
    walk = (np.asarray(md.walkable_raster) > 0) & ~road
    base = np.full(road.shape + (3,), 30, np.uint8)
    base[walk] = (60, 70, 60)
    base[road] = (70, 70, 75)
    base[lane] = (110, 110, 115)
    ppm, off = 5.0, np.asarray(md.world_offset)

    def px(world_pos):
        p = ((np.asarray(world_pos) - off) * ppm).astype(int)
        return (np.clip(p[..., 1], 0, base.shape[0] - 1),
                np.clip(p[..., 0], 0, base.shape[1] - 1))

    def splat(img, ys, xs, color, r=2):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                img[np.clip(ys + dy, 0, img.shape[0] - 1),
                    np.clip(xs + dx, 0, img.shape[1] - 1)] = color

    @jax.jit
    def tick(state, agent):
        control, agent, _ = expert_step(env.map_data, state, agent)
        state, _ = env.step(state, control)
        lstate = light_states(md.light_junction, md.light_phase,
                              md.junction_n_phases,
                              state.episode.light_t0, state.episode.tick)
        return state, agent, lstate

    writer = VideoWriter(args.out, fps=10)
    for t in range(args.ticks):
        state, agent, lstate = tick(state, agent)
        if t % args.every:
            continue
        img = base.copy()
        act = np.asarray(state.npc.active)
        ys, xs = px(np.asarray(state.npc.pos)[act])
        splat(img, ys, xs, (60, 130, 230))                  # vehicles
        act = np.asarray(state.walkers.active)
        ys, xs = px(np.asarray(state.walkers.pos)[act])
        splat(img, ys, xs, (230, 230, 90), r=1)             # walkers
        green = np.asarray(lstate) == 0
        ys, xs = px(np.asarray(md.light_pole_pos))
        splat(img, ys[green], xs[green], (40, 220, 40), r=1)
        splat(img, ys[~green], xs[~green], (220, 40, 40), r=1)
        ys, xs = px(np.asarray(state.ego.pos))
        splat(img, np.array([ys]), np.array([xs]), (255, 255, 255), r=3)
        writer.add(img)
    writer.close()
    print(f'{args.ticks // args.every} map frames '
          f'({base.shape[1]}x{base.shape[0]}) -> {args.out}')
    return args.out


if __name__ == '__main__':
    main()
