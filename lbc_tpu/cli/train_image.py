"""Offline image-agent distillation, phases 0 and 1.

Capability parity with training/train_image_phase0.py (camera-space warmup)
and train_image_phase1.py (map-space distillation with speed noise and
augmentation). Requires a dataset collected with --rgb and a trained
privileged ("teacher") checkpoint.

Usage:
  python -m lbc_tpu.cli.train_image --phase 0 --dataset_dir data/ \
      --teacher-path ckpts/priv/model-256 --log_dir ckpts/phase0
  python -m lbc_tpu.cli.train_image --phase 1 --dataset_dir data/ \
      --teacher-path ckpts/priv/model-256 --ckpt ckpts/phase0/model-16 \
      --log_dir ckpts/phase1 --speed-noise 1.0
"""
from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (BatchSampler, FrameDataset, SampleConfig,
                    augment_batch, schedule_params)
from ..train import (SAVE_EPOCHS, init_birdview_training,
                     init_image_training, make_birdview_model,
                     make_image_model, phase0_train_step,
                     phase1_train_step)
from ..train.checkpoints import (latest_checkpoint, load_checkpoint,
                                 save_checkpoint)
from ..utils.deadline import wall_deadline_passed
from ..utils.experiment import log, save_config


def load_teacher(path, backbone='resnet18'):
    model = make_birdview_model(backbone=backbone, all_branch=True)
    template, _ = init_birdview_training(jax.random.PRNGKey(0), model)
    state = load_checkpoint(path, template)
    return model, {'params': state.params,
                   'batch_stats': state.batch_stats}


def train(config):
    log.init(config['log_dir'])
    save_config(config['log_dir'], config)

    teacher_model, teacher_vars = load_teacher(
        config['teacher_args']['model_path'],
        config['teacher_args'].get('backbone', 'resnet18'))

    model = make_image_model(backbone=config['model_args']['backbone'])
    state, tx = init_image_training(
        jax.random.PRNGKey(config.get('seed', 0)), model,
        lr=config['optimizer_args']['lr'])
    if config.get('ckpt'):
        state = load_checkpoint(config['ckpt'], state)
        log.info('initialized from %s', config['ckpt'])

    ds = FrameDataset(config['data_args']['dataset_dir'],
                      SampleConfig(include_rgb=True),
                      max_frames=config['data_args'].get('max_frames'))

    if config.get('resident', False):
        from ..train.resident import train_resident, upload_dataset
        data = upload_dataset(ds)
        log.info('dataset resident on device: %d frames (%d train)',
                 data.rgb.shape[0], data.n_train)

        def save_fn(st, epoch, force=False):
            import os
            due = epoch in SAVE_EPOCHS or epoch == config['max_epoch']
            already = os.path.isdir(
                os.path.join(config['log_dir'], f'model-{epoch}'))
            if (due or force) and not already:
                save_checkpoint(config['log_dir'], st, epoch)
        state, _ = train_resident(config, state, tx, model,
                                  teacher_model, teacher_vars, data,
                                  log=log, save_fn=save_fn)
        return state

    phase = config['phase']
    # donate the incoming train state: without it every step materializes
    # a fresh ~300 MB params+optimizer pytree and the host-side mirrors
    # of the old ones accumulate faster than they are reclaimed (OOM)
    if phase == 0:
        step = jax.jit(lambda s, b: phase0_train_step(
            s, b, model, tx, teacher_model, teacher_vars),
            donate_argnums=(0,))
    else:
        step = jax.jit(lambda s, b, k: phase1_train_step(
            s, b, model, tx, teacher_model, teacher_vars, k,
            speed_noise=config['speed_noise']), donate_argnums=(0,))

    schedule = config.get('augment_schedule', 'super_hard')
    # jit once: params are dynamic jnp scalars, so the annealing clock
    # does NOT retrace; eager (unjitted) execution dispatched hundreds of
    # ops per batch over the TPU tunnel and churned host memory to OOM
    aug_fn = jax.jit(augment_batch)
    # epoch_offset: resume point for crash-resumed runs (tools/round3b.sh)
    # — continues the sampler order, the augmentation anneal clock, and
    # the RNG stream where the previous chunk left off instead of
    # replaying chunk 1's schedule every time
    epoch_offset = config.get('epoch_offset', 0)
    key = jax.random.PRNGKey(config.get('seed', 0) + 99)
    key = jax.random.fold_in(key, epoch_offset)
    images_seen = (epoch_offset * config['samples_per_epoch']
                   * config['batch_size'])
    for epoch in range(epoch_offset, config['max_epoch'] + 1):
        losses = []
        sampler = BatchSampler(ds, config['batch_size'],
                               samples=config['samples_per_epoch'],
                               seed=epoch, image=True)
        for i, np_batch in enumerate(sampler):
            batch = {k2: jnp.asarray(v) for k2, v in np_batch.items()}
            batch['command'] = batch['command'].astype(jnp.int32)
            if config.get('augment', True):
                key, k1 = jax.random.split(key)
                batch['rgb'] = aug_fn(
                    k1, batch['rgb'],
                    schedule_params(schedule, images_seen))
            images_seen += batch['rgb'].shape[0]
            if phase == 0:
                state, m = step(state, batch)
            else:
                key, k2 = jax.random.split(key)
                state, m = step(state, batch, k2)
            losses.append(m['loss'])   # device-side until epoch end
            if i % 8 == 7:
                # hard sync (device->host transfer): bounds both the
                # async dispatch backlog and deferred buffer frees on
                # the tunnel client — the backlog OOMed at 130 GB
                float(m['loss'])
        for lo in losses:
            log.scalar(is_train=True, loss=float(lo))
        stats = log.end_epoch()
        print(f"epoch {epoch}: loss "
              f"{stats.get(('train', 'loss'), {}).get('mean', -1):.4f}")
        if epoch in SAVE_EPOCHS:
            save_checkpoint(config['log_dir'], state, epoch)
        if (epoch >= int(config.get('deadline_min_epoch', 48))
                and wall_deadline_passed('image')):
            if epoch not in SAVE_EPOCHS:
                save_checkpoint(config['log_dir'], state, epoch)
            print(f'deadline-file stop at epoch {epoch}', flush=True)
            return state
    save_checkpoint(config['log_dir'], state, config['max_epoch'])
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--phase', type=int, choices=[0, 1], required=True)
    ap.add_argument('--dataset_dir', required=True)
    ap.add_argument('--log_dir', required=True)
    ap.add_argument('--teacher-path', required=True)
    ap.add_argument('--teacher-backbone', default='resnet18')
    ap.add_argument('--ckpt', default=None,
                    help='phase-0 checkpoint to start phase 1 from')
    ap.add_argument('--backbone', default='resnet34')
    ap.add_argument('--batch_size', type=int, default=96)
    ap.add_argument('--max_epoch', type=int, default=256)
    ap.add_argument('--samples_per_epoch', type=int, default=1000)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--speed-noise', type=float, default=0.0)
    ap.add_argument('--no-augment', action='store_true')
    ap.add_argument('--augment', default='super_hard',
                    help='augmenter schedule name '
                         '(train_image_phase1.py:286 default)')
    ap.add_argument('--max_frames', type=int, default=None)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--epoch-offset', type=int, default=0,
                    help='resume a crashed run: continue from this epoch '
                         '(pair with --ckpt <log_dir>/model-N); max_epoch '
                         'stays the total epoch count')
    ap.add_argument('--resident', action='store_true',
                    help='upload the dataset to HBM once and train with '
                         'zero per-step host transfer (train/resident.py '
                         '— the fix for the tunnel-client RSS leak)')
    args = ap.parse_args()

    config = {
        'phase': args.phase,
        'resident': args.resident,
        'log_dir': args.log_dir,
        'batch_size': args.batch_size,
        'max_epoch': args.max_epoch,
        'samples_per_epoch': args.samples_per_epoch,
        'speed_noise': args.speed_noise,
        'augment': not args.no_augment,
        'augment_schedule': args.augment,
        'ckpt': args.ckpt,
        'seed': args.seed,
        'epoch_offset': args.epoch_offset,
        'model_args': {'model': 'image_ss', 'backbone': args.backbone},
        'teacher_args': {'model_path': args.teacher_path,
                         'backbone': args.teacher_backbone},
        'data_args': {'dataset_dir': args.dataset_dir,
                      'max_frames': args.max_frames},
        'optimizer_args': {'lr': args.lr},
        'camera_args': {'w': 384, 'h': 160, 'fov': 90, 'world_y': 1.4,
                        'fixed_offset': 4.0},
    }
    train(config)


if __name__ == '__main__':
    main()
