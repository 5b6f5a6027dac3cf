"""Offline red-light-response check for image-agent checkpoints.

The RGB collection suite has no traffic, so every frame where the expert
is stopped is a red-light wait (plus a short launch transient). For those
frames vs a moving-frame control group, run the student net on the
recorded RGB and decode its implied target speed (the exact agent math,
control/waypoint_controller.py:image_agent_control). A student that
learned the light cue predicts near-zero target speed on stop frames and
cruise speed on moving frames; one that ignores lights predicts cruise
speed everywhere (the closed-loop signature: lights run, never stopped
at red — tools/probe_image_agent.py).

Usage:
  python tools/check_light_response.py --ckpt ckpts/image_r3b/phase1/model-128 \
      [--data ckpts/image_r3/data] [--episodes 8] [--platform cpu]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--data', default='ckpts/image_r3/data')
    ap.add_argument('--episodes', type=int, default=8)
    ap.add_argument('--max-frames', type=int, default=96,
                    help='per class (stopped / moving)')
    ap.add_argument('--platform', default=None, choices=[None, 'cpu'])
    args = ap.parse_args()

    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.control.waypoint_controller import (
        image_target_speed, unproject_image_waypoints)
    from lbc_tpu.data.episode_store import Episode, list_episodes
    from lbc_tpu.models import one_hot_command
    from lbc_tpu.train.checkpoints import load_checkpoint
    from lbc_tpu.train.image_trainer import (init_image_training,
                                             make_image_model)
    from lbc_tpu.utils.experiment import load_config

    config = load_config(args.ckpt)
    model = make_image_model(
        backbone=config['model_args'].get('backbone', 'resnet34'),
        all_branch=False)
    template, _ = init_image_training(jax.random.PRNGKey(0), model)
    state = load_checkpoint(args.ckpt, template)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    stop_f, move_f = [], []   # (rgb, speed, cmd)
    for ep_path in list_episodes(args.data)[:args.episodes]:
        ep = Episode(ep_path)
        if ep.rgb is None:
            continue
        meas = np.asarray(ep.measurements)
        speed = np.linalg.norm(meas[:, 5:8], axis=1)
        cmd = meas[:, 11].astype(np.int32)
        stopped = speed < 0.3
        # skip the launch transient (first 50 frames) and require the
        # stop to be inside a >=5-frame run (solid red wait, not jitter)
        for i in range(50, len(ep) - 5):
            if len(stop_f) < args.max_frames and stopped[i - 2:i + 3].all():
                stop_f.append((ep.rgb[i], speed[i], cmd[i]))
            elif len(move_f) < args.max_frames and speed[i] > 3.0:
                move_f.append((ep.rgb[i], speed[i], cmd[i]))
        if len(stop_f) >= args.max_frames and len(move_f) >= args.max_frames:
            break

    print(f'frames: {len(stop_f)} stopped, {len(move_f)} moving')

    @jax.jit
    def implied_tspeed(rgb, speed, cmd):
        loc = model.apply(variables, rgb, speed, one_hot_command(cmd))
        targets = unproject_image_waypoints(loc)
        origin = jnp.zeros_like(targets[..., :1, :])
        return image_target_speed(
            jnp.concatenate([origin, targets], axis=-2))

    def run(frames):
        rgb = jnp.asarray(np.stack([f[0] for f in frames]), jnp.float32) / 255.0
        sp = jnp.asarray(np.asarray([f[1] for f in frames]), jnp.float32)
        cm = jnp.asarray(np.asarray([f[2] for f in frames]), jnp.int32)
        return np.asarray(implied_tspeed(rgb, sp, cm))

    ts_stop = run(stop_f)
    ts_move = run(move_f)
    print(f'implied target speed @ STOPPED(red) frames: '
          f'mean {ts_stop.mean():.2f}  p90 {np.percentile(ts_stop, 90):.2f}')
    print(f'implied target speed @ MOVING frames:       '
          f'mean {ts_move.mean():.2f}  p10 {np.percentile(ts_move, 10):.2f}')
    # the agent brakes when target speed < 1.0 (brake_threshold 2.0 for
    # image params): report the braking fraction per class
    from lbc_tpu.control.waypoint_controller import image_controller_params
    thr = float(image_controller_params().brake_threshold)
    print(f'brake fraction (tspeed <= {thr}): '
          f'stopped {float((ts_stop <= thr).mean()):.2%}, '
          f'moving {float((ts_move <= thr).mean()):.2%}')


if __name__ == '__main__':
    main()
