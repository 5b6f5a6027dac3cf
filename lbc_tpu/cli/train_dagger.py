"""Phase 2: on-policy DAgger fine-tuning CLI.

Capability parity with training/train_image_phase2.py: 20 episodes, each =
on-policy rollouts across the train weathers (dense traffic) + 5 training
epochs on the importance-weighted replay buffer, checkpoint per episode.

Usage:
  python -m lbc_tpu.cli.train_dagger --teacher-path ckpts/priv/model-256 \
      --ckpt ckpts/phase1/model-256 --log_dir ckpts/phase2
"""
from __future__ import annotations

import argparse

import jax

from ..data import ReplayBuffer
from ..train import (dagger_rollout, dagger_train_episode,
                     init_image_training, make_image_model)
from ..train.checkpoints import load_checkpoint, save_checkpoint
from ..utils.deadline import wall_deadline_passed
from ..utils.experiment import log, save_config
from .train_image import load_teacher


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--teacher-path', required=True)
    ap.add_argument('--teacher-backbone', default='resnet18')
    ap.add_argument('--ckpt', required=True,
                    help='phase-1 image checkpoint to fine-tune')
    ap.add_argument('--log_dir', required=True)
    ap.add_argument('--backbone', default='resnet34')
    ap.add_argument('--episodes', type=int, default=20)
    ap.add_argument('--episode_length', type=int, default=1000)
    ap.add_argument('--n_vehicles', type=int, default=100)
    ap.add_argument('--n_pedestrians', type=int, default=250)
    ap.add_argument('--batch_size', type=int, default=64)
    ap.add_argument('--epochs_per_episode', type=int, default=5)
    ap.add_argument('--batches_per_epoch', type=int, default=100)
    ap.add_argument('--capacity', type=int, default=200_000)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--device-buffer', dest='device_buffer',
                    action='store_true', default=None,
                    help='HBM-resident replay (default on TPU): zero '
                         'per-step host traffic, flat RSS '
                         '(train/device_replay.py)')
    ap.add_argument('--host-buffer', dest='device_buffer',
                    action='store_false')
    ap.add_argument('--audit-k', type=int, default=16,
                    help='top-k worst replay samples saved per episode '
                         '(train_image_phase2.py:231-252)')
    ap.add_argument('--deadline-min-episodes', type=int, default=10,
                    help='cooperative wall-clock stop (utils/deadline.py '
                         '"dagger" file): after this many episodes, a '
                         'passed deadline ends the run at the episode '
                         'boundary (checkpoint already saved)')
    args = ap.parse_args()
    if args.device_buffer is None:
        args.device_buffer = jax.default_backend() == 'tpu'

    log.init(args.log_dir)
    config = {'model_args': {'model': 'image_ss',
                             'backbone': args.backbone},
              'agent_args': {}, 'phase': 2,
              'camera_args': {'w': 384, 'h': 160, 'fov': 90,
                              'world_y': 1.4, 'fixed_offset': 4.0}}
    save_config(args.log_dir, config)

    teacher_model, teacher_vars = load_teacher(args.teacher_path,
                                               args.teacher_backbone)
    student_model = make_image_model(backbone=args.backbone)
    state, _ = init_image_training(jax.random.PRNGKey(args.seed),
                                   student_model)
    state = load_checkpoint(args.ckpt, state)

    if args.device_buffer:
        from ..train import (dagger_rollout_device,
                             dagger_train_episode_device)
        from ..train.device_replay import replay_init
        from ..utils.audit import save_replay_audit
        # capacity bounded by HBM: frames are ~186 KB each as uint8
        cap = min(args.capacity,
                  args.episodes * args.episode_length * 4 + 4000)
        buffer = replay_init(cap)
        for episode in range(args.episodes):
            svars = {'params': state.params,
                     'batch_stats': state.batch_stats}
            buffer, added = dagger_rollout_device(
                buffer, student_model, svars, teacher_model,
                teacher_vars, episode,
                episode_length=args.episode_length,
                n_vehicles=args.n_vehicles,
                n_pedestrians=args.n_pedestrians, seed=args.seed)
            log.info('episode %d: +%d frames (buffer %d)', episode,
                     added, int(buffer.size))
            buffer, state, loss = dagger_train_episode_device(
                buffer, student_model, state, lr=args.lr,
                epochs=args.epochs_per_episode,
                batch_size=args.batch_size,
                batches_per_epoch=args.batches_per_epoch,
                seed=args.seed)
            save_checkpoint(args.log_dir, state, episode)
            if args.audit_k:
                save_replay_audit(args.log_dir, buffer, episode,
                                  k=args.audit_k)
            log.info('episode %d: train loss %.4f', episode, loss)
            print(f'episode {episode}: buffer={int(buffer.size)} '
                  f'loss={loss:.4f} saved model-{episode}', flush=True)
            if (episode + 1 >= args.deadline_min_episodes
                    and wall_deadline_passed('dagger')):
                print(f'deadline-file stop after episode {episode}',
                      flush=True)
                break
        return

    buffer = ReplayBuffer(capacity=args.capacity, seed=args.seed)
    for episode in range(args.episodes):
        svars = {'params': state.params, 'batch_stats': state.batch_stats}
        added = dagger_rollout(
            buffer, student_model, svars, teacher_model, teacher_vars,
            episode, episode_length=args.episode_length,
            n_vehicles=args.n_vehicles, n_pedestrians=args.n_pedestrians,
            seed=args.seed)
        log.info('episode %d: +%d frames (buffer %d)', episode, added,
                 len(buffer))
        state = dagger_train_episode(
            buffer, student_model, state, teacher_model, teacher_vars,
            lr=args.lr, epochs=args.epochs_per_episode,
            batch_size=args.batch_size,
            batches_per_epoch=args.batches_per_epoch)
        save_checkpoint(args.log_dir, state, episode)
        print(f'episode {episode}: buffer={len(buffer)} saved model-'
              f'{episode}')
        if (episode + 1 >= args.deadline_min_episodes
                and wall_deadline_passed('dagger')):
            print(f'deadline-file stop after episode {episode}',
                  flush=True)
            break


if __name__ == '__main__':
    main()
