#!/usr/bin/env python
"""Orbit the camera around a vehicle (reference: misc/vehicle_gallery.py).

Upstream iterates the blueprint library and flies the spectator camera
around each spawned model. Our camera is not an actor — it is a pure
function of a viewpoint — so a gallery orbit is just evaluating the
vmapped renderer at a batch of poses on a circle, one pallas/XLA call
for the whole turntable.

    python examples/vehicle_gallery.py --frames 36 --out /tmp/gallery.gif
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--frames', type=int, default=36)
    ap.add_argument('--radius', type=float, default=8.0)
    ap.add_argument('--out', default='/tmp/gallery.gif')
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.render.camera import render_camera
    from lbc_tpu.utils.video import GifMaker

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=1,
                               n_pedestrians=0))
    state = env.reset_np(seed=0, start=40, target=80)
    md = env.map_data

    # the exhibit: one parked vehicle at the ego spawn
    car_pos = state.ego.pos
    car_yaw = state.ego.yaw
    npc_pos = car_pos[None]
    npc_yaw = car_yaw[None]
    npc_active = jnp.ones((1,), bool)
    walker_pos = jnp.zeros((1, 2))
    walker_active = jnp.zeros((1,), bool)
    lights_off = jnp.zeros(md.light_pole_pos.shape[0], jnp.int32)

    # viewpoints on a circle, all facing the car; one vmapped render
    ang = jnp.linspace(0.0, 2 * jnp.pi, args.frames, endpoint=False)
    view_pos = car_pos[None] + args.radius * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=-1)
    view_yaw = jnp.arctan2(car_pos[1] - view_pos[:, 1],
                           car_pos[0] - view_pos[:, 0])

    frames = jax.jit(jax.vmap(
        lambda p, y: render_camera(md, p, y, npc_pos, npc_yaw, npc_active,
                                   walker_pos, walker_active,
                                   md.light_pole_pos, lights_off,
                                   jnp.int32(1))))(view_pos, view_yaw)
    frames = (np.asarray(frames) * 255).astype(np.uint8)

    gif = GifMaker()
    for f in frames:
        gif.add('gallery', f)
    out = Path(args.out)
    gif.save('gallery', save_dir=out.parent, save_path=out.name, fps=12)
    print(f'{args.frames}-frame turntable -> {out}')
    return out


if __name__ == '__main__':
    main()
