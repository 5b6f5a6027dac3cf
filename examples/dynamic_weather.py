#!/usr/bin/env python
"""Animate weather over a drive (reference: misc/dynamic_weather.py).

Upstream mutates the server's WeatherParameters a little every tick.
Here weather is a field of the episode state consumed by the camera's
per-preset appearance table (sky gradient, fog, wetness), so animating
it is a one-word `_replace` — and because the renderer is jitted over
the preset id, sweeping all 14 presets recompiles nothing.

    python examples/dynamic_weather.py --ticks-per 10 --out /tmp/weather.gif
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--ticks-per', type=int, default=10,
                    help='ticks per weather preset')
    ap.add_argument('--out', default='/tmp/weather.gif')
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine import DrivingEnv, EnvConfig
    from lbc_tpu.render.camera import render_camera_state
    from lbc_tpu.utils.video import GifMaker

    env = DrivingEnv(EnvConfig(town=args.town, n_vehicles=10,
                               n_pedestrians=0))
    state = env.reset_np(seed=0, start=30, target=90, weather=1)
    agent = expert_init()

    @jax.jit
    def tick(state, agent, weather):
        state = state._replace(
            episode=state.episode._replace(weather=weather))
        control, agent, _ = expert_step(env.map_data, state, agent)
        state, _ = env.step(state, control)
        return state, agent, render_camera_state(env.map_data, state)

    gif = GifMaker()
    for weather in range(1, 15):
        for _ in range(args.ticks_per):
            state, agent, cam = tick(state, agent,
                                     jnp.int32(weather))
            gif.add('weather', (np.asarray(cam) * 255).astype(np.uint8))
    out = Path(args.out)
    gif.save('weather', save_dir=out.parent, save_path=out.name, fps=10)
    print(f'14 presets x {args.ticks_per} ticks -> {out}')
    return out


if __name__ == '__main__':
    main()
