#!/usr/bin/env python
"""Minimal lbc-tpu walkthrough (reference: misc/tutorial.py).

The upstream tutorial connects to a CARLA server, spawns a vehicle on
autopilot, attaches an RGB camera, and saves what it sees. Here the
whole world is a device-resident pytree and one jitted step function —
no server, no actor handles: build the env, hand control to the expert,
and render the same 384x160 camera from world state.

    python examples/tutorial.py --ticks 100 --out /tmp/tutorial
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--ticks', type=int, default=100)
    ap.add_argument('--out', default='/tmp/tutorial')
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.render.bev import render_bev_state
    from lbc_tpu.render.camera import render_camera_state
    from lbc_tpu.utils import visualize_birdview

    # 1. build a world: one env, light traffic
    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=10,
                               n_pedestrians=20))
    state = env.reset_np(seed=0, start=30, target=90, weather=1)

    # 2. the "autopilot": the expert agent, jitted together with the step
    agent = expert_init()

    @jax.jit
    def tick(state, agent):
        control, agent, _ = expert_step(env.map_data, state, agent)
        state, obs = env.step(state, control)
        return state, agent, obs

    for t in range(args.ticks):
        state, agent, obs = tick(state, agent)

    # 3. "attach a camera": render any state, any time — it's just a fn
    cam = np.asarray(render_camera_state(env.map_data, state))
    bev = np.asarray(render_bev_state(env.map_data, state))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    import imageio
    imageio.imwrite(out / 'camera.png', (cam * 255).astype(np.uint8))
    imageio.imwrite(out / 'birdview.png', visualize_birdview(bev))
    speed = float(state.ego.speed)
    print(f'after {args.ticks} ticks: speed {speed:.1f} m/s, '
          f'images in {out}/')
    return speed


if __name__ == '__main__':
    main()
