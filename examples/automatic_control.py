#!/usr/bin/env python
"""Agent drives a route with a HUD recording (reference:
misc/automatic_control.py).

Upstream wires a pygame HUD, a collision/lane sensor stack, and a
BasicAgent into a 700-line client loop. Here episode bookkeeping
(route progress, collisions, light infractions, timeout) already lives
inside the jitted env step; this example just runs the expert to the
goal and composites a HUD over the camera + BEV views.

    python examples/automatic_control.py --ticks 300 --out /tmp/auto.avi
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--start', type=int, default=30)
    ap.add_argument('--target', type=int, default=90)
    ap.add_argument('--vehicles', type=int, default=20)
    ap.add_argument('--walkers', type=int, default=30)
    ap.add_argument('--ticks', type=int, default=300)
    ap.add_argument('--out', default='/tmp/auto.avi')
    args = ap.parse_args(argv)

    import cv2
    import jax
    import numpy as np

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.render.bev import render_bev_state
    from lbc_tpu.render.camera import render_camera_state
    from lbc_tpu.utils import visualize_birdview
    from lbc_tpu.utils.video import VideoWriter

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.vehicles,
                               n_pedestrians=args.walkers))
    state = env.reset_np(seed=1, start=args.start, target=args.target)
    agent = expert_init()

    @jax.jit
    def tick(state, agent):
        control, agent, _ = expert_step(env.map_data, state, agent)
        state, obs = env.step(state, control)
        cam = render_camera_state(env.map_data, state)
        bev = render_bev_state(env.map_data, state)
        return state, agent, obs, control, cam, bev

    writer = VideoWriter(args.out, fps=10)
    names = ['', 'LEFT', 'RIGHT', 'STRAIGHT', 'FOLLOW']
    result = 'timeout'
    for t in range(args.ticks):
        state, agent, obs, control, cam, bev = tick(state, agent)
        canvas = np.zeros((320, 384 + 320, 3), np.uint8)
        canvas[:160, :384] = (np.asarray(cam) * 255).astype(np.uint8)
        canvas[:, 384:] = visualize_birdview(np.asarray(bev))
        c = np.asarray(control)
        hud = [f'tick {t}   speed {float(state.ego.speed):4.1f} m/s',
               f'cmd {names[int(obs["command"])]}'
               f'   steer {c[0]:+.2f} thr {c[1]:.2f} brk {c[2]:.2f}',
               f'collided {bool(obs["collided"])}'
               f'   invaded {bool(obs["invaded"])}'
               f'   goal {float(obs["distance_to_goal"]):5.1f} m']
        for i, line in enumerate(hud):
            cv2.putText(canvas, line, (6, 180 + 22 * i),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, (240, 240, 240), 1)
        writer.add(canvas)
        if bool(obs['done']):
            result = 'success' if bool(obs['success']) else 'failure'
            break
    writer.close()
    print(f'episode {result} after {t + 1} ticks -> {args.out}')
    return result


if __name__ == '__main__':
    main()
