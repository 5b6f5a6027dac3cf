"""Image-agent distillation: phase 0 (camera space) and phase 1 (map space).

Capability parity with training/train_image_phase0.py and
train_image_phase1.py: phase 0 warms the student up to mimic the frozen
teacher's waypoints projected into camera coordinates; phase 1 distills in
map space with the student's predictions unprojected to BEV, the L1 taken
over all four command branches, and gaussian speed noise clamped to
[0, 10] (train_image_phase1.py:171-182).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..models import BirdviewPolicy, ImagePolicy, one_hot_command
from .coord_converter import bev_to_image, image_to_bev
from .train_state import TrainState, create_train_state
from .losses import location_loss_normalized


def make_image_model(backbone='resnet34', all_branch=True,
                     dtype=jnp.float32):
    return ImagePolicy(backbone=backbone, all_branch=all_branch,
                       dtype=dtype)


def init_image_training(rng, model, lr=1e-4, batch_for_init=2):
    tx = optax.adam(lr)
    example = (jnp.zeros((batch_for_init, 160, 384, 3)),
               jnp.zeros((batch_for_init,)),
               jnp.zeros((batch_for_init, 4)))
    state = create_train_state(rng, model, tx, example)
    return state, tx


def teacher_all_branch(teacher_model, teacher_vars, birdview, speed):
    """Frozen teacher forward over all four branches -> (B, 4, 5, 2)."""
    b = birdview.shape[0]
    dummy_cmd = jnp.zeros((b, 4))
    out = teacher_model.apply(teacher_vars, birdview, speed, dummy_cmd,
                              train=False)
    assert isinstance(out, tuple), 'teacher must be built with all_branch'
    return out[1]


def phase0_train_step(state: TrainState, batch, model, tx, teacher_model,
                      teacher_vars):
    """Camera-space mimic: L1(student_img, project(teacher_bev))
    (train_image_phase0.py:81-89). batch: rgb, birdview, command, speed."""
    t_branches = teacher_all_branch(teacher_model, teacher_vars,
                                    batch['birdview'], batch['speed'])
    target_img = bev_to_image(t_branches)             # (B, 4, 5, 2)
    cmd = one_hot_command(batch['command'])

    def loss_fn(params):
        variables = {'params': params, 'batch_stats': state.batch_stats}
        (sel, branches), mut = model.apply(
            variables, batch['rgb'], batch['speed'], cmd, train=True,
            mutable=['batch_stats'])
        loss = jnp.mean(jnp.abs(branches - target_img))
        return loss, mut['batch_stats']

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, params, stats, opt), {'loss': loss}


def phase1_train_step(state: TrainState, batch, model, tx, teacher_model,
                      teacher_vars, rng, speed_noise: float = 0.0):
    """Map-space distillation over all branches with speed noise
    (train_image_phase1.py:171-205)."""
    t_branches = teacher_all_branch(teacher_model, teacher_vars,
                                    batch['birdview'], batch['speed'])
    cmd = one_hot_command(batch['command'])
    speed = batch['speed']
    if speed_noise > 0:
        noise = speed_noise * jax.random.normal(rng, speed.shape)
        speed = jnp.clip(speed + noise, 0.0, 10.0)

    def loss_fn(params):
        variables = {'params': params, 'batch_stats': state.batch_stats}
        (sel, branches), mut = model.apply(
            variables, batch['rgb'], speed, cmd, train=True,
            mutable=['batch_stats'])
        pred_bev = image_to_bev(branches)
        loss = jnp.mean(jnp.abs(pred_bev - t_branches))
        return loss, mut['batch_stats']

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(state.step + 1, params, stats, opt), {'loss': loss}
