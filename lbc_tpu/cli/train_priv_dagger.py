"""On-policy DAgger for the privileged (birdview) agent — CLI.

No reference counterpart (the reference trains the privileged net purely
offline, training/train_birdview.py); this closes the traffic-recovery
imitation gap with fork-expert labels (see train/priv_dagger.py). Loop
shape follows train_image_phase2.py:261-300: per episode, on-policy
collection then importance-weighted training, checkpoint per episode.

Usage:
  python -m lbc_tpu.cli.train_priv_dagger \
      --ckpt ckpts/priv_full/priv/model-32 --log_dir ckpts/priv_dagger
"""
from __future__ import annotations

import argparse

import jax

from ..data import ReplayBuffer
from ..engine import DrivingEnv, EnvConfig
from ..train import init_birdview_training, make_birdview_model
from ..train.checkpoints import load_checkpoint, save_checkpoint
from ..train.priv_dagger import (priv_dagger_rollout,
                                 priv_dagger_train_episode)
from ..utils.deadline import wall_deadline_passed
from ..utils.experiment import log, save_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ckpt', required=True,
                    help='offline birdview checkpoint to fine-tune')
    ap.add_argument('--log_dir', required=True)
    ap.add_argument('--backbone', default='resnet18')
    ap.add_argument('--episodes', type=int, default=20)
    ap.add_argument('--episode_length', type=int, default=1000)
    ap.add_argument('--town', default='Town01')
    ap.add_argument('--n_vehicles', type=int, default=20)
    ap.add_argument('--n_pedestrians', type=int, default=50)
    ap.add_argument('--n_envs', type=int, default=4)
    ap.add_argument('--batch_size', type=int, default=256)
    ap.add_argument('--epochs_per_episode', type=int, default=5)
    ap.add_argument('--batches_per_epoch', type=int, default=100)
    ap.add_argument('--capacity', type=int, default=200_000)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--deadline-min-episodes', type=int, default=6,
                    help='cooperative wall-clock stop (utils/deadline.py '
                         'file "privdagger"): once this many episodes '
                         'have trained, a passed deadline ends the run '
                         'at the episode boundary')
    ap.add_argument('--mix-dense', action='store_true',
                    help='alternate regular/dense-traffic episodes '
                         '(device-buffer path only)')
    ap.add_argument('--device-buffer', dest='device_buffer',
                    action='store_true', default=None,
                    help='HBM-resident replay (default on TPU): zero '
                         'per-step host traffic, flat RSS')
    ap.add_argument('--host-buffer', dest='device_buffer',
                    action='store_false')
    args = ap.parse_args()
    if args.device_buffer is None:
        args.device_buffer = jax.default_backend() == 'tpu'

    log.init(args.log_dir)
    config = {'model_args': {'model': 'birdview_dian',
                             'backbone': args.backbone,
                             'input_channel': 7},
              'agent_args': {}, 'phase': 'priv_dagger'}
    save_config(args.log_dir, config)

    model = make_birdview_model(backbone=args.backbone)
    state, _ = init_birdview_training(jax.random.PRNGKey(args.seed),
                                      model)
    state = load_checkpoint(args.ckpt, state)

    if args.device_buffer:
        from ..train.device_replay import replay_init
        from ..train.priv_dagger import (PRIV_SPECS,
                                         priv_dagger_rollout_device,
                                         priv_dagger_train_episode_device)
        # packed crops are 36 KB/frame; bound capacity by actual intake
        cap = min(args.capacity,
                  args.episodes * args.episode_length * args.n_envs
                  + 4000)
        buffer = replay_init(cap, specs=PRIV_SPECS)
        envs = [DrivingEnv(EnvConfig(town=args.town,
                                     n_vehicles=args.n_vehicles,
                                     n_pedestrians=args.n_pedestrians))]
        if args.mix_dense:
            # alternate regular / dense episodes so the NoCrash dense
            # rows are on-distribution too (two env shapes = two rollout
            # compilations, paid once each)
            envs.append(DrivingEnv(EnvConfig(town=args.town,
                                             n_vehicles=100,
                                             n_pedestrians=250)))
        for episode in range(args.episodes):
            variables = {'params': state.params,
                         'batch_stats': state.batch_stats}
            buffer, added = priv_dagger_rollout_device(
                buffer, model, variables, episode,
                episode_length=args.episode_length,
                env=envs[episode % len(envs)], n_envs=args.n_envs,
                seed=args.seed)
            log.info('episode %d: +%d frames (buffer %d)', episode,
                     added, int(buffer.size))
            buffer, state, loss = priv_dagger_train_episode_device(
                buffer, model, state, lr=args.lr,
                epochs=args.epochs_per_episode,
                batch_size=args.batch_size,
                batches_per_epoch=args.batches_per_epoch,
                seed=args.seed)
            save_checkpoint(args.log_dir, state, episode)
            log.info('episode %d: train loss %.4f', episode, loss)
            print(f'episode {episode}: buffer={int(buffer.size)} '
                  f'loss={loss:.4f} saved model-{episode}', flush=True)
            if (episode + 1 >= args.deadline_min_episodes
                    and wall_deadline_passed('privdagger')):
                print(f'deadline-file stop after episode {episode}',
                      flush=True)
                break
        print('DONE', flush=True)
        return

    buffer = ReplayBuffer(capacity=args.capacity, seed=args.seed)
    for episode in range(args.episodes):
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        added = priv_dagger_rollout(
            buffer, model, variables, episode,
            episode_length=args.episode_length, town=args.town,
            n_vehicles=args.n_vehicles,
            n_pedestrians=args.n_pedestrians, n_envs=args.n_envs,
            seed=args.seed)
        log.info('episode %d: +%d frames (buffer %d)', episode, added,
                 len(buffer))
        state, loss = priv_dagger_train_episode(
            buffer, model, state, lr=args.lr,
            epochs=args.epochs_per_episode,
            batch_size=args.batch_size,
            batches_per_epoch=args.batches_per_epoch)
        save_checkpoint(args.log_dir, state, episode)
        log.info('episode %d: train loss %.4f', episode, loss)
        print(f'episode {episode}: buffer={len(buffer)} loss={loss:.4f} '
              f'saved model-{episode}', flush=True)
        if (episode + 1 >= args.deadline_min_episodes
                and wall_deadline_passed('privdagger')):
            print(f'deadline-file stop after episode {episode}',
                  flush=True)
            break
    print('DONE', flush=True)


if __name__ == '__main__':
    main()
