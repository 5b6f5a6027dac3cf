"""Device-resident image distillation: the whole dataset lives in HBM.

Root-cause fix for the tunneled-TPU-client host-memory growth
(tools/leak_repro.py): every host->device transfer leaks ~2.3x the bytes
transferred in host RSS (per-transfer buffers the tunnel client never
frees; a `const` run that transfers nothing is flat). Streaming batches
therefore OOMs any long training run. Instead we upload the dataset ONCE
— RGB as uint8 and the image-sample BEV crop as bit-packed uint8 (the
reference's fixed, jitter-free crop, image_lmdb.py:149-151) — and every
train step gathers, decodes, augments, and distills entirely on device.
Per-step host traffic is one PRNG fold and one scalar read; RSS is flat
and steps never wait on the ~100 MB/s tunnel.

Budget parity: matches training/train_image_phase{0,1}.py exactly —
teacher forward per step on the (possibly speed-noised) batch
(train_image_phase1.py:171-199: the teacher sees the SAME noised speed as
the student, which is why teacher labels cannot be precomputed), L1 over
all four branches, super_hard augmentation annealed by images_seen.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CROP_SIZE, PIXEL_OFFSET
from ..data.augment import augment_batch, schedule_params
from ..utils.deadline import wall_deadline_passed
from ..data.datasets import FrameDataset
from ..data.episode_store import unpack_birdview_jnp
from ..models import one_hot_command
from .coord_converter import bev_to_image, image_to_bev
from .image_trainer import teacher_all_branch
from .train_state import TrainState

# the image pipeline's fixed BEV crop of the packed 320x320 array
# (datasets.py get_image_sample: rows 58:250, cols 64:256)
_CY = 260 - CROP_SIZE // 2
_R0 = -PIXEL_OFFSET + _CY - CROP_SIZE // 2
_C0 = 160 - CROP_SIZE // 2


class ResidentData(NamedTuple):
    """The full dataset as device arrays (~11 GB for 53k frames)."""
    rgb: jnp.ndarray              # (N, 160, 384, 3) uint8
    bev_crop_packed: jnp.ndarray  # (N, 192, 192) uint8 (7 bit-planes)
    speed: jnp.ndarray            # (N,) float32
    command: jnp.ndarray          # (N,) int32
    n_train: int                  # frames < n_train are the train split


@partial(jax.jit, donate_argnums=(0,))
def _fill(buf, chunk, off):
    start = (off,) + (0,) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, chunk, start)


def upload_dataset(ds: FrameDataset, val_episodes: int = 4,
                   chunk_frames: int = 512) -> ResidentData:
    """One-time upload of every usable frame, in fixed-size chunks (a
    single jit program; the final chunk is padded to avoid a retrace).
    Split: the last `val_episodes` episodes are validation."""
    n = len(ds.index)
    n_eps = len(ds.episodes)
    val_start_ep = max(n_eps - val_episodes, 0)
    n_train = next((k for k, (e, _) in enumerate(ds.index)
                    if e >= val_start_ep), n)

    rgb = jnp.zeros((n, 160, 384, 3), jnp.uint8)
    bev = jnp.zeros((n, CROP_SIZE, CROP_SIZE), jnp.uint8)
    size = min(chunk_frames, n)
    off = 0
    while off < n:
        # final chunk re-aligns backward (overlap rewrites identical
        # rows) — dynamic_update_slice would otherwise CLAMP the start
        # index and shift the tail
        start = min(off, n - size)
        rgb_np = np.zeros((size, 160, 384, 3), np.uint8)
        bev_np = np.zeros((size, CROP_SIZE, CROP_SIZE), np.uint8)
        for j in range(size):
            e, i = ds.index[start + j]
            ep = ds.episodes[e]
            rgb_np[j] = ep.rgb[i]
            bev_np[j] = ep.birdview_packed[i][_R0:_R0 + CROP_SIZE,
                                              _C0:_C0 + CROP_SIZE]
        rgb = _fill(rgb, jnp.asarray(rgb_np), start)
        bev = _fill(bev, jnp.asarray(bev_np), start)
        off = start + size
    return ResidentData(rgb=rgb, bev_crop_packed=bev,
                        speed=jnp.asarray(ds.speeds),
                        command=jnp.asarray(ds.commands, jnp.int32),
                        n_train=n_train)


def _gather_batch(data: ResidentData, idx):
    rgb = jnp.take(data.rgb, idx, axis=0).astype(jnp.float32) / 255.0
    crop = unpack_birdview_jnp(jnp.take(data.bev_crop_packed, idx,
                                        axis=0))
    speed = jnp.take(data.speed, idx, axis=0)
    cmd = jnp.take(data.command, idx, axis=0)
    return rgb, crop, speed, cmd


def make_resident_step(model, tx, teacher_model, teacher_vars, phase: int,
                       batch_size: int, speed_noise: float = 0.0,
                       augment: bool = True):
    """One fused jitted train step: on-device index draw -> gather ->
    unpack/augment/noise -> frozen-teacher forward -> student update."""

    def step(state: TrainState, data: ResidentData, key, aug_params):
        k_idx, k_aug, k_noise = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, data.n_train)
        rgb, crop, speed, cmd_i = _gather_batch(data, idx)
        if augment:
            rgb = augment_batch(k_aug, rgb, aug_params)
        if speed_noise > 0:
            speed = jnp.clip(
                speed + speed_noise * jax.random.normal(k_noise,
                                                        speed.shape),
                0.0, 10.0)
        t_branches = teacher_all_branch(teacher_model, teacher_vars,
                                        crop, speed)
        target = bev_to_image(t_branches) if phase == 0 else t_branches
        cmd = one_hot_command(cmd_i)

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            (sel, branches), mut = model.apply(
                variables, rgb, speed, cmd, train=True,
                mutable=['batch_stats'])
            pred = branches if phase == 0 else image_to_bev(branches)
            return jnp.mean(jnp.abs(pred - target)), mut['batch_stats']

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (TrainState(state.step + 1, params, stats, opt), loss)

    return jax.jit(step, donate_argnums=(0,))


def make_resident_val_step(model, teacher_model, teacher_vars, phase: int,
                           batch_size: int):
    """Deterministic validation step over a fixed index window (no
    augmentation, no speed noise, running batch stats)."""

    def step(state: TrainState, data: ResidentData, start):
        idx = start + jnp.arange(batch_size)
        idx = jnp.clip(idx, 0, data.rgb.shape[0] - 1)
        rgb, crop, speed, cmd_i = _gather_batch(data, idx)
        t_branches = teacher_all_branch(teacher_model, teacher_vars,
                                        crop, speed)
        target = bev_to_image(t_branches) if phase == 0 else t_branches
        cmd = one_hot_command(cmd_i)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        out = model.apply(variables, rgb, speed, cmd, train=False)
        branches = out[1] if isinstance(out, tuple) else out
        pred = branches if phase == 0 else image_to_bev(branches)
        return jnp.mean(jnp.abs(pred - target))

    return jax.jit(step)


def train_resident(config, state: TrainState, tx, model, teacher_model,
                   teacher_vars, data: ResidentData, log=None,
                   save_fn=None):
    """Full phase-0/1 run in ONE process with flat RSS.

    Epoch = samples_per_epoch steps of batch_size on-device draws (the
    reference's Wrap semantics, birdview_lmdb.py:233-249); augmentation
    anneal clock = cumulative images seen (augmenter.py schedules)."""
    phase = config['phase']
    batch = config['batch_size']
    schedule = config.get('augment_schedule', 'super_hard')
    augment = bool(config.get('augment', True)) and phase != 0
    step = make_resident_step(
        model, tx, teacher_model, teacher_vars, phase, batch,
        speed_noise=float(config.get('speed_noise', 0.0)),
        augment=augment)
    val_step = make_resident_val_step(model, teacher_model, teacher_vars,
                                      phase, batch)
    n_val = int(data.rgb.shape[0]) - data.n_train

    # epoch_offset resumes a crashed run: max_epoch stays the TOTAL epoch
    # count, the loop continues from the offset, and the sampler RNG /
    # augmentation anneal clock pick up where the dead process stopped.
    epoch_offset = int(config.get('epoch_offset', 0))
    key = jax.random.fold_in(
        jax.random.PRNGKey(config.get('seed', 0) + 99), epoch_offset)
    images_seen = epoch_offset * config['samples_per_epoch'] * batch
    history = []
    for epoch in range(epoch_offset, config['max_epoch'] + 1):
        losses = []
        for _ in range(config['samples_per_epoch']):
            key, k = jax.random.split(key)
            params = schedule_params(schedule, images_seen)
            state, loss = step(state, data, k, params)
            losses.append(loss)
            images_seen += batch
        train_loss = float(jnp.mean(jnp.stack(losses)))
        val_losses = [val_step(state, data, data.n_train + s)
                      for s in range(0, max(n_val - batch, 1),
                                     max(batch * 4, 1))]
        val_loss = (float(jnp.mean(jnp.stack(val_losses)))
                    if val_losses else float('nan'))
        history.append((epoch, train_loss, val_loss))
        if log is not None:
            log.scalar(is_train=True, loss=train_loss)
            log.scalar(is_train=False, loss=val_loss)
            log.end_epoch()
        print(f'epoch {epoch}: train {train_loss:.4f} '
              f'val {val_loss:.4f}', flush=True)
        if save_fn is not None:
            save_fn(state, epoch)
        # cooperative wall-clock stop (utils/deadline.py): checkpoint and
        # exit cleanly so the marker-gated pipeline behind us advances;
        # deadline_min_epoch keeps a late start from producing a useless
        # near-untrained checkpoint
        if (epoch >= int(config.get('deadline_min_epoch', 48))
                and wall_deadline_passed('image')):
            if save_fn is not None:
                save_fn(state, epoch, force=True)
            print(f'deadline-file stop at epoch {epoch}', flush=True)
            break
    return state, history
