"""Train the privileged birdview model.

Capability parity with /root/reference/training/train_birdview.py: config
dict serialized as config.json, Adam 1e-4 / batch 256 defaults, epoch 0 =
dry run (no optimizer step), checkpoints at exponential SAVE_EPOCHS,
--resume reloads the newest checkpoint, pred-vs-gt dot overlays logged per
epoch. Data-parallel over all local devices via the mesh sharding.

Usage:
  python -m lbc_tpu.cli.train_birdview --dataset_dir data/ --log_dir ckpt/
"""
from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BatchSampler, FrameDataset, SampleConfig
from ..models import one_hot_command
from ..parallel import make_mesh, replicated, shard_batch
from ..train import (SAVE_EPOCHS, birdview_eval_step, birdview_train_step,
                     init_birdview_training, make_birdview_model,
                     make_sharded_train_step)
from ..train.checkpoints import (latest_checkpoint, latest_epoch,
                                 load_checkpoint, save_checkpoint)
from ..utils.experiment import log, save_config
from ..utils.visualize import visualize_birdview


def visualize_batch(batch, pred):
    """Pred (teal) vs gt (white) dots on the BEV crop
    (train_birdview.py:57-99)."""
    if 'birdview' in batch:
        bv = np.asarray(batch['birdview'][0])
    else:
        from ..data.episode_store import unpack_birdview
        bv = unpack_birdview(np.asarray(batch['birdview_packed'][0]))
    canvas = visualize_birdview(bv).copy()
    for (x, y) in np.asarray(batch['location_px'][0]):
        xi, yi = int(np.clip(x, 0, 191)), int(np.clip(y, 0, 191))
        canvas[max(yi - 1, 0):yi + 2, max(xi - 1, 0):xi + 2] = (255, 255,
                                                                255)
    px = (np.asarray(pred[0]) + 1) / 2 * 192
    for (x, y) in px:
        xi, yi = int(np.clip(x, 0, 191)), int(np.clip(y, 0, 191))
        canvas[max(yi - 1, 0):yi + 2, max(xi - 1, 0):xi + 2] = (0, 192,
                                                                192)
    return canvas


def train(config):
    log.init(config['log_dir'])
    save_config(config['log_dir'], config)

    ds = FrameDataset(
        config['data_args']['dataset_dir'],
        SampleConfig(
            crop_x_jitter=config['data_args']['crop_x_jitter'],
            crop_y_jitter=config['data_args']['crop_y_jitter'],
            angle_jitter=config['data_args']['angle_jitter'],
            gap=config['data_args']['gap'],
            n_step=config['model_args']['n_step']),
        max_frames=config['data_args'].get('max_frames'))
    val_ds = FrameDataset(
        config['data_args'].get('val_dataset_dir',
                                config['data_args']['dataset_dir']),
        SampleConfig(crop_x_jitter=0, crop_y_jitter=0, angle_jitter=0,
                     gap=config['data_args']['gap'],
                     n_step=config['model_args']['n_step']))

    model = make_birdview_model(
        backbone=config['model_args']['backbone'],
        dtype=jnp.bfloat16 if config.get('bf16') else jnp.float32)
    state, tx = init_birdview_training(
        jax.random.PRNGKey(config.get('seed', 0)), model,
        lr=config['optimizer_args']['lr'])

    start_epoch = 0
    if config.get('resume'):
        ckpt = latest_checkpoint(config['log_dir'])
        if ckpt is not None:
            state = load_checkpoint(ckpt, state)
            start_epoch = latest_epoch(config['log_dir']) + 1
            log.info('resumed from %s', ckpt)

    mesh = make_mesh()
    train_step = make_sharded_train_step(mesh, model, tx)
    eval_step = jax.jit(partial(birdview_eval_step, model=model))
    state = jax.device_put(state, replicated(mesh))
    log.epoch = start_epoch

    batch_size = config['batch_size']
    for epoch in range(start_epoch, config['max_epoch'] + 1):
        dry_run = epoch == 0      # train_birdview.py:110,126-129
        sampler = BatchSampler(
            ds, batch_size, samples=10 if dry_run
            else config['samples_per_epoch'],
            seed=config.get('seed', 0) * 1000 + epoch,
            cmd_biased=config['data_args'].get('cmd_biased', False),
            packed=True)
        # losses stay on device until epoch end: a float() per step would
        # serialize the pipeline on a host<->device sync each batch
        train_losses = []
        for np_batch in sampler:
            batch = shard_batch(mesh, {
                'birdview_packed': np_batch['birdview_packed'],
                'location_px': np_batch['location_px'],
                'command': np_batch['command'],
                'speed': np_batch['speed']})
            if dry_run:
                out = eval_step(state, batch)
                train_losses.append(out['loss'])
            else:
                state, metrics = train_step(state, batch)
                train_losses.append(metrics['loss'])
        for lo in train_losses:
            log.scalar(is_train=True, loss=float(lo))

        val_sampler = BatchSampler(val_ds, batch_size, samples=10,
                                   seed=777, packed=True)
        last = None
        val_losses = []
        for np_batch in val_sampler:
            batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
            out = eval_step(state, batch)
            val_losses.append(out['loss'])
            last = (np_batch, out['pred'])
        for lo in val_losses:
            log.scalar(is_train=False, loss=float(lo))
        if last is not None:
            log.image(is_train=False,
                      birdview=visualize_batch(last[0], last[1]))
        stats = log.end_epoch()
        print(f"epoch {epoch}: train "
              f"{stats.get(('train', 'loss'), {}).get('mean', float('nan')):.4f} "
              f"val {stats.get(('val', 'loss'), {}).get('mean', float('nan')):.4f}")

        if epoch in SAVE_EPOCHS:
            save_checkpoint(config['log_dir'], state, epoch)
    save_checkpoint(config['log_dir'], state, config['max_epoch'])
    return state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset_dir', required=True)
    ap.add_argument('--val_dataset_dir', default=None)
    ap.add_argument('--log_dir', required=True)
    ap.add_argument('--log_iterations', type=int, default=100)
    ap.add_argument('--max_epoch', type=int, default=1000)
    ap.add_argument('--samples_per_epoch', type=int, default=1000)
    ap.add_argument('--batch_size', type=int, default=256)
    ap.add_argument('--lr', type=float, default=1e-4)
    ap.add_argument('--backbone', default='resnet18')
    ap.add_argument('--n_step', type=int, default=5)
    ap.add_argument('--gap', type=int, default=5)
    ap.add_argument('--angle_jitter', type=int, default=5)
    ap.add_argument('--crop_x_jitter', type=int, default=5)
    ap.add_argument('--crop_y_jitter', type=int, default=5)
    ap.add_argument('--max_frames', type=int, default=None)
    ap.add_argument('--cmd_biased', action='store_true')
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--resume', action='store_true')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    config = {
        'log_dir': args.log_dir,
        'log_iterations': args.log_iterations,
        'max_epoch': args.max_epoch,
        'samples_per_epoch': args.samples_per_epoch,
        'batch_size': args.batch_size,
        'seed': args.seed,
        'bf16': args.bf16,
        'resume': args.resume,
        'model_args': {
            'model': 'birdview_dian',
            'backbone': args.backbone,
            'input_channel': 7,
            'n_step': args.n_step,
        },
        'agent_args': {
            'steer_points': {'1': 3, '2': 2, '3': 2, '4': 2},
        },
        'data_args': {
            'dataset_dir': args.dataset_dir,
            'val_dataset_dir': args.val_dataset_dir or args.dataset_dir,
            'gap': args.gap,
            'angle_jitter': args.angle_jitter,
            'crop_x_jitter': args.crop_x_jitter,
            'crop_y_jitter': args.crop_y_jitter,
            'max_frames': args.max_frames,
            'cmd_biased': args.cmd_biased,
        },
        'optimizer_args': {'lr': args.lr},
    }
    train(config)


if __name__ == '__main__':
    main()
