"""Interactive viewer / manual driving (reference: misc/manual_control.py,
misc/no_rendering_mode.py — the vendored CARLA example clients).

Drives a single env of the batched engine with the keyboard (arrows =
steer/throttle/brake, space = handbrake, q = quit), rendering the camera
view and the BEV side by side with pygame. `--autopilot` hands control to
the expert. `--record out.avi` dumps the session.

Headless smoke mode: `--frames N --record out.avi --autopilot` runs N
ticks without a window (SDL dummy driver).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--start', type=int, default=30)
    ap.add_argument('--target', type=int, default=90)
    ap.add_argument('--weather', type=int, default=1)
    ap.add_argument('--vehicles', type=int, default=20)
    ap.add_argument('--walkers', type=int, default=50)
    ap.add_argument('--autopilot', action='store_true')
    ap.add_argument('--record', default=None)
    ap.add_argument('--frames', type=int, default=0,
                    help='>0: headless, run this many ticks and exit')
    args = ap.parse_args()

    if args.frames:
        os.environ.setdefault('SDL_VIDEODRIVER', 'dummy')

    import jax
    import jax.numpy as jnp
    import pygame

    from ..agents import expert_init
    from ..agents.autopilot import expert_step
    from ..engine import DrivingEnv, EnvConfig, stack_states
    from ..render.bev import render_bev_state
    from ..render.camera import render_camera_state
    from ..utils import visualize_birdview
    from ..utils.video import VideoWriter

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=args.vehicles,
                               n_pedestrians=args.walkers))
    state = env.reset_np(seed=0, start=args.start, target=args.target,
                         weather=args.weather)
    if args.vehicles or args.walkers:
        batch = env.warmup(stack_states([state]), ticks=30)
        state = jax.tree.map(lambda x: x[0], batch)
    agent = expert_init()

    step = jax.jit(env.step)
    estep = jax.jit(lambda s, a: expert_step(env.map_data, s, a))
    bev_fn = jax.jit(lambda s: render_bev_state(env.map_data, s))
    cam_fn = jax.jit(lambda s: render_camera_state(env.map_data, s))

    pygame.init()
    w, h = 384 + 320, 320
    screen = pygame.display.set_mode((w, h))
    pygame.display.set_caption('lbc-tpu manual control')
    clock = pygame.time.Clock()
    writer = VideoWriter(args.record) if args.record else None

    steer, throttle, brake = 0.0, 0.0, 0.0
    tick = 0
    running = True
    while running:
        for event in pygame.event.get():
            if event.type == pygame.QUIT:
                running = False
        keys = pygame.key.get_pressed()
        if keys[pygame.K_q] or keys[pygame.K_ESCAPE]:
            running = False
        steer = (-0.6 if keys[pygame.K_LEFT] else 0.0) \
            + (0.6 if keys[pygame.K_RIGHT] else 0.0)
        throttle = 0.8 if keys[pygame.K_UP] else 0.0
        brake = 1.0 if (keys[pygame.K_DOWN] or keys[pygame.K_SPACE]) \
            else 0.0

        if args.autopilot:
            control, agent, _ = estep(state, agent)
        else:
            control = jnp.array([steer, throttle, brake])
        state, obs = step(state, control)

        cam = np.asarray(cam_fn(state))
        bev = visualize_birdview(np.asarray(bev_fn(state)))
        cam_img = (cam * 255).astype(np.uint8)
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas[:160, :384] = cam_img
        canvas[:, 384:] = bev
        if writer:
            writer.add(canvas)
        surf = pygame.surfarray.make_surface(canvas.swapaxes(0, 1))
        screen.blit(surf, (0, 0))
        pygame.display.flip()
        clock.tick(10)

        tick += 1
        if args.frames and tick >= args.frames:
            running = False
        if bool(obs['done']):
            print('episode done: success =', bool(obs['success']))
            running = False

    if writer:
        writer.close()
    pygame.quit()


if __name__ == '__main__':
    main()
