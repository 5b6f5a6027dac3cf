"""Phase 2: on-policy DAgger fine-tuning of the image agent.

Capability parity with training/train_image_phase2.py + phase2_utils.py:
per episode, on-policy rollouts execute a mix of student and teacher
control with P(student) = 0.5 + 0.5 (1 - beta^episode) (beta = 0.95,
train_image_phase2.py:45-58); frames store (rgb, command, speed, teacher
BEV waypoints, BEV crop) with importance weights
w = mean_i 0.7^i * sum_xy(|student - teacher| * (0.7, 0.3))
(phase2_utils.py:50-59); the last 5 frames before a collision are dropped
(train_image_phase2.py:144-145); each episode trains 5 epochs with a fresh
Adam (train_image_phase2.py:162-164) on importance-sampled batches whose
weights are refreshed from the current student loss.

TPU-first: rollouts are batched (one env per train weather at once, more
if requested); both networks, both controllers, the BEV + camera renders
and the control-mixing RNG live inside one jitted scan.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import AGENT_CROP_DX, TRAIN_WEATHERS
from ..control import (ControllerState, birdview_agent_control,
                       controller_init, image_agent_control)
from ..data.replay import ReplayBuffer
from ..engine import DrivingEnv, EnvConfig, stack_states
from ..engine.rollout import make_rollout
from ..models import crop_birdview, one_hot_command
from ..render.bev import render_bev_state
from ..render.camera import render_camera_state
from .coord_converter import image_to_bev
from .train_state import TrainState

DECAY = np.array([0.7 ** i for i in range(5)], np.float32)
XY_BIAS = np.array([0.7, 0.3], np.float32)


def sample_weight(student_bev, teacher_bev):
    """phase2_utils.py:50-59 / train_image_phase2.py:74-81; both inputs in
    [-1, 1] BEV coords, shape (..., 5, 2)."""
    err = np.abs(np.asarray(student_bev) - np.asarray(teacher_bev))
    return np.mean((err * XY_BIAS).sum(axis=-1) * DECAY, axis=-1)


class DaggerAgentState(NamedTuple):
    img_ctrl: ControllerState
    bv_ctrl: ControllerState
    rng: jnp.ndarray


def dagger_agent_init(seed=0) -> DaggerAgentState:
    return DaggerAgentState(controller_init(), controller_init(),
                            jax.random.PRNGKey(seed))


def make_dagger_agent(student_model, student_vars, teacher_model,
                      teacher_vars, episode: int, beta: float = 0.95):
    p_student = 0.5 + 0.5 * (1.0 - beta ** episode)

    def step(map_data, env_state, obs, astate: DaggerAgentState):
        rgb = render_camera_state(map_data, env_state)
        bev = render_bev_state(map_data, env_state)
        crop = crop_birdview(bev, dx=AGENT_CROP_DX)

        speed = obs['speed']
        command = obs['command']
        cmd_oh = one_hot_command(command[None])

        s_out = student_model.apply(student_vars, rgb[None], speed[None],
                                    cmd_oh)
        s_locs = (s_out[0] if isinstance(s_out, tuple) else s_out)[0]
        img_control, img_ctrl = image_agent_control(
            s_locs, speed, command, astate.img_ctrl)

        t_out = teacher_model.apply(teacher_vars, crop[None], speed[None],
                                    cmd_oh)
        t_locs = (t_out[0] if isinstance(t_out, tuple) else t_out)[0]
        bv_control, bv_ctrl = birdview_agent_control(
            t_locs, speed, command, astate.bv_ctrl)

        key, k = jax.random.split(astate.rng)
        use_student = jax.random.uniform(k, ()) < p_student
        control = jnp.where(use_student, img_control, bv_control)

        packed = jnp.zeros(crop.shape[:2], jnp.uint8)
        for c in range(7):
            packed = packed | ((crop[..., c] > 0).astype(jnp.uint8) << c)
        aux = {
            'rgb': (rgb * 255).astype(jnp.uint8),
            'bev_packed': packed,
            'command': command,
            'speed': speed,
            'teacher_locs': t_locs,
            'student_locs_bev': image_to_bev(s_locs),
            'collided': env_state.episode.collided,
            'done': env_state.episode.done,
        }
        if isinstance(t_out, tuple):
            aux['teacher_branches'] = t_out[1][0]
        return control, DaggerAgentState(img_ctrl, bv_ctrl, key), aux

    return step


def make_dagger_agent_batched(student_model, student_vars, teacher_model,
                              teacher_vars, episode: int,
                              beta: float = 0.95,
                              interpret: bool = False):
    """Batched DAgger agent: both renders run through the fused Pallas
    kernels and both nets see the full env batch. This replaces the
    per-env XLA camera inside the long fused scan — the pattern that
    crashed the TPU worker in round 1 (CLAUDE.md) — and matches
    make_dagger_agent step-for-step (tests/test_camera_kernel.py)."""
    from ..engine.lights import light_states_md
    from ..ops import render_bev_crop_pallas
    from ..ops.camera_kernel import render_camera_state_pallas
    p_student = 0.5 + 0.5 * (1.0 - beta ** episode)

    def step(map_data, env_states, obs, astates: DaggerAgentState):
        rgb = render_camera_state_pallas(map_data, env_states,
                                         interpret=interpret)
        lstate = jax.vmap(lambda t0, t: light_states_md(
            map_data, t0, t))(
                env_states.episode.light_t0, env_states.episode.tick)
        crop = render_bev_crop_pallas(
            map_data, env_states.ego.pos, env_states.ego.yaw,
            env_states.npc.pos, env_states.npc.yaw, env_states.npc.active,
            env_states.walkers.pos, env_states.walkers.active, lstate,
            dx=AGENT_CROP_DX, interpret=interpret)

        speed = obs['speed']
        command = obs['command']
        cmd_oh = one_hot_command(command)

        s_out = student_model.apply(student_vars, rgb, speed, cmd_oh)
        s_locs = s_out[0] if isinstance(s_out, tuple) else s_out
        img_control, img_ctrl = image_agent_control(
            s_locs, speed, command, astates.img_ctrl)

        t_out = teacher_model.apply(teacher_vars, crop, speed, cmd_oh)
        t_locs = t_out[0] if isinstance(t_out, tuple) else t_out
        bv_control, bv_ctrl = birdview_agent_control(
            t_locs, speed, command, astates.bv_ctrl)

        ks = jax.vmap(jax.random.split)(astates.rng)    # (B, 2, 2)
        key, k = ks[:, 0], ks[:, 1]
        u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(k)
        use_student = u < p_student
        control = jnp.where(use_student[:, None], img_control, bv_control)

        packed = jnp.zeros(crop.shape[:3], jnp.uint8)
        for c in range(7):
            packed = packed | ((crop[..., c] > 0).astype(jnp.uint8) << c)
        aux = {
            'rgb': (rgb * 255).astype(jnp.uint8),
            'bev_packed': packed,
            'command': command,
            'speed': speed,
            'teacher_locs': t_locs,
            'student_locs_bev': image_to_bev(s_locs),
            'collided': env_states.episode.collided,
            'done': env_states.episode.done,
        }
        if isinstance(t_out, tuple):
            # all-branch teacher waypoints: lets the device replay buffer
            # train without storing (or re-rendering) any birdview
            aux['teacher_branches'] = t_out[1]
        return control, DaggerAgentState(img_ctrl, bv_ctrl, key), aux

    return step


def _episode_valid_mask(done_t, collided_t, episode_length):
    """(T, B) done/collided flags -> (T, B) bool keep-mask: frames before
    the first done, minus the last 5 before a collision
    (train_image_phase2.py:144-145). Pure jnp — runs on device."""
    t_axis = jnp.arange(done_t.shape[0])[:, None]
    any_done = jnp.any(done_t, axis=0)
    first_done = jnp.argmax(done_t.astype(jnp.int32), axis=0)
    n = jnp.where(any_done, first_done, episode_length)
    col = jnp.any(collided_t, axis=0)
    n = jnp.where(col, jnp.maximum(n - 5, 0), n)
    return t_axis < n[None, :]


def dagger_rollout_device(buffer, student_model, student_vars,
                          teacher_model, teacher_vars, episode: int,
                          episode_length: int = 1000, town: str = 'Town01',
                          n_vehicles: int = 100, n_pedestrians: int = 250,
                          weathers=TRAIN_WEATHERS, seed: int = 0,
                          env: DrivingEnv = None, pose_pairs=None,
                          batched: bool = None,
                          pallas_interpret: bool = False):
    """dagger_rollout against a DeviceReplay: the rollout records stay on
    device; weights, validity, and buffer insertion are all jnp. Returns
    (buffer, frames_added:int)."""
    from .device_replay import replay_add

    if env is None:
        env = DrivingEnv(EnvConfig(town=town, n_vehicles=n_vehicles,
                                   n_pedestrians=n_pedestrians))
    rng = np.random.RandomState(seed * 131 + episode)
    n_spawn = len(env.map_np.spawn_pos)
    states = []
    for w in weathers:
        if pose_pairs is not None:
            start, target = pose_pairs[rng.randint(len(pose_pairs))]
        else:
            start, target = rng.randint(0, n_spawn, 2)
        states.append(env.reset_np(seed=seed + episode, start=start,
                                   target=target, weather=w))
    batch = stack_states(states)
    if n_vehicles or n_pedestrians:
        batch = env.warmup(batch, ticks=50)

    if batched is None:
        batched = jax.default_backend() == 'tpu'
    if batched:
        agent_step = make_dagger_agent_batched(
            student_model, student_vars, teacher_model, teacher_vars,
            episode, interpret=pallas_interpret)
    else:
        agent_step = make_dagger_agent(student_model, student_vars,
                                       teacher_model, teacher_vars,
                                       episode)
    agents = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[dagger_agent_init(seed * 733 + episode * 17 + i)
          for i in range(len(states))])

    def collect(env_state, obs, control, aux):
        keep = {k: v for k, v in aux.items() if k != 'bev_packed'}
        return keep
    collect.batched = batched

    rollout = make_rollout(env, agent_step, episode_length,
                           collect=collect, batched_agent=batched)
    final, _, metrics, recs = rollout(batch, agents)
    assert 'teacher_branches' in recs, \
        'device replay needs an all_branch teacher'

    err = jnp.abs(recs['student_locs_bev'] - recs['teacher_locs'])
    weights = jnp.mean(jnp.sum(err * jnp.asarray(XY_BIAS), -1)
                       * jnp.asarray(DECAY), -1)              # (T, B)
    valid = _episode_valid_mask(recs['done'], recs['collided'],
                                episode_length)

    def flat(x):
        return x.reshape((-1,) + x.shape[2:])

    buffer = replay_add(
        buffer,
        {'rgb': flat(recs['rgb']),
         'teacher_branches': flat(recs['teacher_branches']),
         'command': flat(recs['command']).astype(jnp.int32),
         'speed': flat(recs['speed'])},
        flat(weights), flat(valid))
    return buffer, int(jnp.sum(valid))


def dagger_rollout(buffer: ReplayBuffer, student_model, student_vars,
                   teacher_model, teacher_vars, episode: int,
                   episode_length: int = 1000, town: str = 'Town01',
                   n_vehicles: int = 100, n_pedestrians: int = 250,
                   weathers=TRAIN_WEATHERS, seed: int = 0,
                   env: DrivingEnv = None, pose_pairs=None,
                   batched: bool = None,
                   pallas_interpret: bool = False) -> int:
    """One DAgger data-collection episode: rollouts across the train
    weathers simultaneously; frames added to the replay buffer."""
    if env is None:
        env = DrivingEnv(EnvConfig(town=town, n_vehicles=n_vehicles,
                                   n_pedestrians=n_pedestrians))
    rng = np.random.RandomState(seed * 131 + episode)
    n_spawn = len(env.map_np.spawn_pos)

    states = []
    for w in weathers:
        if pose_pairs is not None:
            start, target = pose_pairs[rng.randint(len(pose_pairs))]
        else:
            start, target = rng.randint(0, n_spawn, 2)
        states.append(env.reset_np(seed=seed + episode, start=start,
                                   target=target, weather=w))
    batch = stack_states(states)
    if n_vehicles or n_pedestrians:
        batch = env.warmup(batch, ticks=50)

    if batched is None:
        batched = jax.default_backend() == 'tpu'
    if batched:
        agent_step = make_dagger_agent_batched(
            student_model, student_vars, teacher_model, teacher_vars,
            episode, interpret=pallas_interpret)
    else:
        agent_step = make_dagger_agent(student_model, student_vars,
                                       teacher_model, teacher_vars,
                                       episode)
    agents = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[dagger_agent_init(seed * 733 + episode * 17 + i)
          for i in range(len(states))])

    def collect(env_state, obs, control, aux):
        return aux
    collect.batched = batched

    rollout = make_rollout(env, agent_step, episode_length,
                           collect=collect, batched_agent=batched)
    final, _, metrics, recs = rollout(batch, agents)

    done_t = np.asarray(recs['done'])          # (T, B)
    collided_t = np.asarray(recs['collided'])
    teacher_locs = np.asarray(recs['teacher_locs'])
    student_locs = np.asarray(recs['student_locs_bev'])
    weights = sample_weight(student_locs, teacher_locs)   # (T, B)

    added = 0
    for b in range(len(states)):
        n = int(np.argmax(done_t[:, b])) if done_t[:, b].any() \
            else episode_length
        if collided_t[:, b].any():
            n = max(n - 5, 0)      # drop last 5 pre-collision frames
        for t in range(n):
            buffer.add(
                weight=float(weights[t, b]),
                rgb=np.asarray(recs['rgb'][t, b]),
                bev_packed=np.asarray(recs['bev_packed'][t, b]),
                command=int(np.asarray(recs['command'][t, b])),
                speed=float(np.asarray(recs['speed'][t, b])),
                teacher_locs=teacher_locs[t, b])
            added += 1
    return added


def dagger_train_episode_device(buffer, student_model,
                                student_state: TrainState, lr=1e-4,
                                epochs: int = 5, batch_size: int = 64,
                                batches_per_epoch: int = 100,
                                seed: int = 0):
    """dagger_train_episode against a DeviceReplay: importance sampling,
    gather, student update and weight refresh all inside ONE jitted step
    — zero per-step host traffic (the stored all-branch teacher waypoints
    replace the reference's per-batch frozen-teacher forward,
    train_image_phase2.py:192-199). Returns (buffer, state)."""
    from .device_replay import (replay_normalize, replay_sample_idx,
                                replay_update_weights)

    tx = optax.adam(lr)

    def train_step(state, buf, key):
        idx = replay_sample_idx(buf, key, batch_size)
        rgb = jnp.take(buf.rgb, idx, axis=0).astype(jnp.float32) / 255.0
        t_branches = jnp.take(buf.teacher_branches, idx, axis=0)
        cmd_i = jnp.take(buf.command, idx, axis=0)
        speed = jnp.take(buf.speed, idx, axis=0)
        cmd = one_hot_command(cmd_i)

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            (sel, branches), mut = student_model.apply(
                variables, rgb, speed, cmd, train=True,
                mutable=['batch_stats'])
            pred_bev = image_to_bev(branches)
            per_sample = jnp.mean(jnp.abs(pred_bev - t_branches),
                                  axis=(1, 2, 3))
            sel_bev = image_to_bev(sel)
            t_sel = jnp.einsum('bkso,bk->bso', t_branches,
                               cmd.astype(t_branches.dtype))
            err = jnp.abs(sel_bev - t_sel)
            new_w = jnp.mean(jnp.sum(err * jnp.asarray(XY_BIAS), -1)
                             * jnp.asarray(DECAY), -1)
            return jnp.mean(per_sample), (mut['batch_stats'], new_w)

        (loss, (stats, new_w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        buf = replay_update_weights(buf, idx, new_w)
        return (TrainState(state.step + 1, params, stats, opt), buf,
                loss)

    # donate state + buffer (we own both; the incoming state is copied
    # first because its params typically alias the rollout's student_vars
    # — the round-2 use-after-donate lesson)
    jit_step = jax.jit(train_step, donate_argnums=(0, 1))
    state = jax.tree.map(jnp.copy, student_state)
    key = jax.random.PRNGKey(seed * 9173 + 55)
    losses = []
    for _ in range(epochs):
        # "fresh Adam each epoch" (train_image_phase2.py:162-164) = reset
        # optimizer state; adam(lr) itself is a pure transformation
        state = state._replace(opt_state=tx.init(state.params))
        buffer = replay_normalize(buffer)
        for _ in range(batches_per_epoch):
            key, k = jax.random.split(key)
            state, buffer, loss = jit_step(state, buffer, k)
            losses.append(loss)
    mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else -1.0
    return buffer, state, mean_loss


def dagger_train_episode(buffer: ReplayBuffer, student_model,
                         student_state: TrainState, teacher_model,
                         teacher_vars, lr=1e-4, epochs: int = 5,
                         batch_size: int = 64,
                         batches_per_epoch: int = 100) -> TrainState:
    """5 epochs with a fresh Adam over importance-sampled batches
    (train_image_phase2.py:152-258)."""
    from ..data.episode_store import unpack_birdview

    def train_step(state, batch):
        cmd = one_hot_command(batch['command'])

        def loss_fn(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats}
            (sel, branches), mut = student_model.apply(
                variables, batch['rgb'], batch['speed'], cmd, train=True,
                mutable=['batch_stats'])
            pred_bev = image_to_bev(branches)
            t_branches = teacher_model.apply(
                teacher_vars, batch['birdview'], batch['speed'], cmd,
                train=False)[1]
            per_sample = jnp.mean(jnp.abs(pred_bev - t_branches),
                                  axis=(1, 2, 3))
            # refreshed importance weights from the selected branch
            sel_bev = image_to_bev(sel)
            t_sel = jnp.einsum('bkso,bk->bso', t_branches,
                               cmd.astype(t_branches.dtype))
            err = jnp.abs(sel_bev - t_sel)
            new_w = jnp.mean(jnp.sum(err * jnp.asarray(XY_BIAS), -1)
                             * jnp.asarray(DECAY), -1)
            return jnp.mean(per_sample), (mut['batch_stats'], new_w)

        (loss, (stats, new_w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, stats, opt), loss, new_w

    # donate the train state: un-donated ~300 MB params+opt pytrees pile
    # up as host mirrors on the tunneled TPU client (see train_image).
    # Copy the incoming state first — donation deletes the input buffers,
    # and the first step would otherwise consume arrays the CALLER still
    # owns (student_state.params is typically aliased by the rollout's
    # student_vars); one ~300 MB copy per episode is cheap insurance.
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    state = jax.tree.map(jnp.copy, student_state)
    for _ in range(epochs):
        tx = optax.adam(lr)     # fresh optimizer each epoch
        state = state._replace(opt_state=tx.init(state.params))
        buffer.normalize_weights()
        for _ in range(batches_per_epoch):
            idx, raw = buffer.sample(batch_size)
            batch = {
                'rgb': jnp.asarray(raw['rgb'], jnp.float32) / 255.0,
                'birdview': jnp.asarray(
                    unpack_birdview(raw['bev_packed'])),
                'command': jnp.asarray(raw['command'], jnp.int32),
                'speed': jnp.asarray(raw['speed'], jnp.float32),
            }
            state, loss, new_w = jit_step(state, batch)
            buffer.update_weights(idx, np.asarray(new_w))
    return state
