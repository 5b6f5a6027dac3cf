"""On-policy DAgger for the PRIVILEGED (birdview) agent.

The reference has no counterpart: its privileged agent is trained purely
offline (training/train_birdview.py) and, as RESULTS.md documents, the
offline imitator collapses in traffic it never had to recover from
(NoCrash v3/v4). The reference *image* DAgger loop
(training/train_image_phase2.py:61-149) fixes the same distribution-shift
problem for the camera student by querying the on-board teacher during
student-driven rollouts. For the privileged net the teacher must be the
rule-based expert, whose supervision is not an action but the *future
trajectory it would drive* — something the reference could never obtain,
because CARLA's server state cannot be forked.

Here it can: the whole world state is a device-resident pytree
(engine/state.py), so labeling is exact on-policy DAgger:

1. roll the student (mixed with the expert per the phase-2 beta schedule,
   train_image_phase2.py:45-58) and record EVERY visited env state;
2. fork all T x B visited states into one big batch, zero their terminal
   flags, and roll the *expert* forward GAP*STEPS ticks in a single
   vmapped scan (expert-only steps cost ~10 us/env-step on one chip);
3. the forked ego positions at t+GAP*{1..5}, rotated into the frame of
   the visited state, are exactly the waypoint labels the offline
   pipeline derives from dataset futures (data/datasets.py:23-38) — but
   on the STUDENT's state distribution, including recovery states.

Samples carry the phase-2 importance weights
w = mean_i 0.7^i * sum_xy(|student - label| * (0.7, 0.3))
(phase2_utils.py:50-59) and train with the phase-2 loop shape (fresh Adam
per epoch, importance sampling, weight refresh from the current loss;
train_image_phase2.py:152-258) on the birdview location loss
(train_birdview.py:33-54).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import AGENT_CROP_DX, CROP_SIZE, GAP, PIXELS_PER_METER, \
    STEPS
from ..control import ControllerState, birdview_agent_control, \
    controller_init
from ..data.replay import ReplayBuffer
from ..engine import DrivingEnv, EnvConfig, stack_states
from ..engine.rollout import make_rollout
from ..models import one_hot_command
from .dagger import DECAY, XY_BIAS
from .losses import location_loss
from .train_state import TrainState


class PrivDaggerAgentState(NamedTuple):
    bv_ctrl: ControllerState      # student's waypoint controller
    ex_state: tuple               # expert PID pair (ExpertState)
    rng: jnp.ndarray


def priv_dagger_agent_init(seed=0) -> PrivDaggerAgentState:
    from ..agents.autopilot import expert_init
    return PrivDaggerAgentState(controller_init(), expert_init(),
                                jax.random.PRNGKey(seed))


def future_to_crop_px(future_pos, ego_pos, ego_yaw):
    """Expert-future world points -> training-label pixels in the
    dx=AGENT_CROP_DX crop.

    Exactly the inverse of the agent decode
    (control/waypoint_controller.py:birdview_locations_to_targets,
    mirroring birdview.py:122-134): ego anchor at (col 96, row 192),
    5 px/m — identical to the offline dataset labels at zero jitter
    (data/datasets.py:23-38 with dy=-PIXEL_OFFSET).

    future_pos: (..., K, 2) world; ego_pos: (..., 2); ego_yaw: (...,).
    Returns (..., K, 2) (pixel_x, pixel_y) float32.
    """
    d = future_pos - ego_pos[..., None, :]
    ox, oy = jnp.cos(ego_yaw), jnp.sin(ego_yaw)
    forward = d[..., 0] * ox[..., None] + d[..., 1] * oy[..., None]
    lateral = -d[..., 0] * oy[..., None] + d[..., 1] * ox[..., None]
    px = CROP_SIZE / 2.0 + lateral * PIXELS_PER_METER
    py = float(CROP_SIZE) - forward * PIXELS_PER_METER
    return jnp.stack([px, py], axis=-1)


def make_priv_dagger_agent_batched(model, variables, episode: int,
                                   beta: float = 0.95,
                                   interpret: bool = False):
    """Batched mixed student/expert rollout agent. aux carries the
    training inputs (packed crop, command, speed) plus the student's
    [-1,1] predictions for importance weights; the rollout's `collect`
    adds the full env state for fork-labeling."""
    from ..agents.autopilot import expert_step
    from ..engine.lights import light_states_md
    from ..ops import render_bev_crop_pallas
    p_student = 0.5 + 0.5 * (1.0 - beta ** episode)

    def step(map_data, env_states, obs, astates: PrivDaggerAgentState):
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

        s_out = model.apply(variables, crop, speed, cmd_oh)
        s_locs = s_out[0] if isinstance(s_out, tuple) else s_out
        bv_control, bv_ctrl = birdview_agent_control(
            s_locs, speed, command, astates.bv_ctrl)

        ex_control, ex_state, _ = jax.vmap(
            lambda st, ag: expert_step(map_data, st, ag))(
                env_states, astates.ex_state)

        ks = jax.vmap(jax.random.split)(astates.rng)
        key, k = ks[:, 0], ks[:, 1]
        u = jax.vmap(lambda kk: jax.random.uniform(kk, ()))(k)
        use_student = u < p_student
        control = jnp.where(use_student[:, None], bv_control, ex_control)

        packed = jnp.zeros(crop.shape[:3], jnp.uint8)
        for c in range(7):
            packed = packed | ((crop[..., c] > 0).astype(jnp.uint8) << c)
        aux = {
            'bev_packed': packed,
            'command': command,
            'speed': speed,
            'student_locs': s_locs,
            'collided': env_states.episode.collided,
            'done': env_states.episode.done,
        }
        return control, PrivDaggerAgentState(bv_ctrl, ex_state, key), aux

    return step


def fork_expert_futures(env: DrivingEnv, states,
                        n_ticks: int = GAP * STEPS + 1, mesh=None):
    """Roll the EXPERT from every state in `states` (a stacked EnvState
    batch of any flat size F) for n_ticks; return the ego positions at
    ticks GAP*{1..STEPS} as (F, STEPS, 2) world coordinates.

    Terminal flags of the incoming states are cleared first — a fork is a
    hypothetical future, not the episode itself (the rollout would
    otherwise freeze forks whose parent tick had done=True)."""
    from ..agents.autopilot import expert_init, expert_step

    ep = states.episode
    F = ep.done.shape[0]
    states = states._replace(episode=ep._replace(
        done=jnp.zeros_like(ep.done),
        success=jnp.zeros_like(ep.success),
        collided=jnp.zeros_like(ep.collided)))

    def agent_fn(map_data, env_state, obs, agent):
        return expert_step(map_data, env_state, agent)

    def collect(env_state, obs, control, aux):
        return env_state.ego.pos

    agents = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (F,) + x.shape), expert_init())
    rollout = make_rollout(env, agent_fn, n_ticks, collect=collect,
                           mesh=mesh)
    _, _, _, pos_t = rollout(states, agents)     # (n_ticks, F, 2)
    # collect records the state BEFORE each scan step, so pos_t[i] is the
    # position after i expert steps; default n_ticks = GAP*STEPS + 1 makes
    # pos_t[GAP*STEPS] (position after the full horizon) available.
    idx = [min(GAP * (k + 1), n_ticks - 1) for k in range(STEPS)]
    return jnp.stack([pos_t[i] for i in idx], axis=1)


def priv_dagger_rollout(buffer: ReplayBuffer, model, variables,
                        episode: int, episode_length: int = 1000,
                        town: str = 'Town01', n_vehicles: int = 20,
                        n_pedestrians: int = 50, n_envs: int = 4,
                        seed: int = 0, env: DrivingEnv = None,
                        pose_pairs=None, beta: float = 0.95,
                        interpret: bool = None,
                        weathers=None) -> int:
    """One DAgger collection episode: student-driven rollouts, fork-expert
    labels, frames into the replay buffer. Returns #frames added."""
    if interpret is None:       # Pallas interprets on non-TPU backends
        interpret = jax.default_backend() != 'tpu'
    if env is None:
        env = DrivingEnv(EnvConfig(town=town, n_vehicles=n_vehicles,
                                   n_pedestrians=n_pedestrians))
    rng = np.random.RandomState(seed * 131 + episode)
    n_spawn = len(env.map_np.spawn_pos)

    states = []
    for i in range(n_envs):
        if pose_pairs is not None:
            start, target = pose_pairs[rng.randint(len(pose_pairs))]
        else:
            start, target = rng.randint(0, n_spawn, 2)
        w = weathers[i % len(weathers)] if weathers else 1
        states.append(env.reset_np(seed=seed + episode * 31 + i,
                                   start=int(start), target=int(target),
                                   weather=int(w)))
    batch = stack_states(states)
    if n_vehicles or n_pedestrians:
        batch = env.warmup(batch, ticks=50)

    agent_step = make_priv_dagger_agent_batched(
        model, variables, episode, beta=beta, interpret=interpret)
    agents = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[priv_dagger_agent_init(seed * 733 + episode * 17 + i)
          for i in range(n_envs)])

    def collect(env_state, obs, control, aux):
        rec = dict(aux)
        rec['state'] = env_state
        return rec
    collect.batched = True

    rollout = make_rollout(env, agent_step, episode_length,
                           collect=collect, batched_agent=True)
    final, _, metrics, recs = rollout(batch, agents)

    # ---- fork-expert labels for every visited (t, b) state ----
    T, B = np.asarray(recs['done']).shape
    flat_states = jax.tree.map(
        lambda x: x.reshape((T * B,) + x.shape[2:]), recs['state'])
    futures = fork_expert_futures(env, flat_states)          # (T*B, 5, 2)
    ego_pos = recs['state'].ego.pos.reshape(T * B, 2)
    ego_yaw = recs['state'].ego.yaw.reshape(T * B)
    label_px = np.asarray(
        future_to_crop_px(futures, ego_pos, ego_yaw)).reshape(T, B, STEPS,
                                                              2)

    # importance weights: student [-1,1] vs label [-1,1]
    label_norm = label_px / (CROP_SIZE / 2.0) - 1.0
    student = np.asarray(recs['student_locs'])               # (T, B, 5, 2)
    err = np.abs(student - label_norm)
    weights = np.mean((err * XY_BIAS).sum(-1) * DECAY, -1)   # (T, B)

    done_t = np.asarray(recs['done'])
    collided_t = np.asarray(recs['collided'])
    bev_packed = np.asarray(recs['bev_packed'])
    command = np.asarray(recs['command'])
    speed = np.asarray(recs['speed'])

    added = 0
    for b in range(B):
        n = int(np.argmax(done_t[:, b])) if done_t[:, b].any() \
            else T
        if collided_t[:, b].any():
            n = max(n - 5, 0)      # drop pre-collision frames (phase 2)
        for t in range(n):
            buffer.add(
                weight=float(weights[t, b]),
                bev_packed=bev_packed[t, b],
                command=int(command[t, b]),
                speed=float(speed[t, b]),
                location_px=label_px[t, b].astype(np.float32))
            added += 1
    return added


# per-frame field specs for the device-resident buffer (train/device_replay)
PRIV_SPECS = {
    'bev_packed': ((CROP_SIZE, CROP_SIZE), jnp.uint8),
    'command': ((), jnp.int32),
    'speed': ((), jnp.float32),
    'location_px': ((STEPS, 2), jnp.float32),
}


def priv_dagger_rollout_device(buffer, model, variables, episode: int,
                               episode_length: int = 1000,
                               town: str = 'Town01', n_vehicles: int = 20,
                               n_pedestrians: int = 50, n_envs: int = 4,
                               seed: int = 0, env: DrivingEnv = None,
                               pose_pairs=None, beta: float = 0.95,
                               interpret: bool = None, weathers=None):
    """priv_dagger_rollout against a DeviceReplay (specs=PRIV_SPECS):
    fork-expert labeling, importance weights, validity trimming and buffer
    insertion all stay on device — zero per-frame host traffic (the
    tunneled client leaks ~2.3x every host->device byte,
    tools/leak_repro.py). Returns (buffer, frames_added:int)."""
    from .dagger import _episode_valid_mask
    from .device_replay import replay_add

    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if env is None:
        env = DrivingEnv(EnvConfig(town=town, n_vehicles=n_vehicles,
                                   n_pedestrians=n_pedestrians))
    rng = np.random.RandomState(seed * 131 + episode)
    n_spawn = len(env.map_np.spawn_pos)

    states = []
    for i in range(n_envs):
        if pose_pairs is not None:
            start, target = pose_pairs[rng.randint(len(pose_pairs))]
        else:
            start, target = rng.randint(0, n_spawn, 2)
        w = weathers[i % len(weathers)] if weathers else 1
        states.append(env.reset_np(seed=seed + episode * 31 + i,
                                   start=int(start), target=int(target),
                                   weather=int(w)))
    batch = stack_states(states)
    if n_vehicles or n_pedestrians:
        batch = env.warmup(batch, ticks=50)

    agent_step = make_priv_dagger_agent_batched(
        model, variables, episode, beta=beta, interpret=interpret)
    agents = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[priv_dagger_agent_init(seed * 733 + episode * 17 + i)
          for i in range(n_envs)])

    def collect(env_state, obs, control, aux):
        rec = dict(aux)
        rec['state'] = env_state
        return rec
    collect.batched = True

    rollout = make_rollout(env, agent_step, episode_length,
                           collect=collect, batched_agent=True)
    final, _, metrics, recs = rollout(batch, agents)

    # ---- fork-expert labels for every visited (t, b) state, on device --
    T, B = recs['done'].shape
    flat_states = jax.tree.map(
        lambda x: x.reshape((T * B,) + x.shape[2:]), recs['state'])
    futures = fork_expert_futures(env, flat_states)          # (T*B, 5, 2)
    ego_pos = recs['state'].ego.pos.reshape(T * B, 2)
    ego_yaw = recs['state'].ego.yaw.reshape(T * B)
    label_px = future_to_crop_px(futures, ego_pos, ego_yaw)  # (T*B, 5, 2)

    label_norm = label_px / (CROP_SIZE / 2.0) - 1.0
    student = recs['student_locs'].reshape(T * B, STEPS, 2)
    err = jnp.abs(student - label_norm)
    weights = jnp.mean(jnp.sum(err * jnp.asarray(XY_BIAS), -1)
                       * jnp.asarray(DECAY), -1)             # (T*B,)
    valid = _episode_valid_mask(recs['done'], recs['collided'],
                                episode_length).reshape(T * B)

    buffer = replay_add(
        buffer,
        {'bev_packed': recs['bev_packed'].reshape(
            (T * B, CROP_SIZE, CROP_SIZE)),
         'command': recs['command'].reshape(T * B).astype(jnp.int32),
         'speed': recs['speed'].reshape(T * B),
         'location_px': label_px.astype(jnp.float32)},
        weights, valid)
    return buffer, int(jnp.sum(valid))


def priv_dagger_train_episode_device(buffer, model, state: TrainState,
                                     lr=1e-4, epochs: int = 5,
                                     batch_size: int = 256,
                                     batches_per_epoch: int = 100,
                                     seed: int = 0):
    """priv_dagger_train_episode against a DeviceReplay: importance
    sampling, gather, unpack, update and weight refresh in ONE jitted
    step (phase-2 loop shape, train_image_phase2.py:152-258). Returns
    (buffer, state, mean_loss)."""
    from ..data.episode_store import unpack_birdview_jnp
    from .device_replay import (replay_normalize, replay_sample_idx,
                                replay_update_weights)

    tx = optax.adam(lr)

    def train_step(st, buf, key):
        idx = replay_sample_idx(buf, key, batch_size)
        bv = unpack_birdview_jnp(jnp.take(buf.fields['bev_packed'], idx,
                                          axis=0))
        cmd = one_hot_command(jnp.take(buf.fields['command'], idx, axis=0))
        speed = jnp.take(buf.fields['speed'], idx, axis=0)
        target_px = jnp.take(buf.fields['location_px'], idx, axis=0)

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': st.batch_stats}
            pred, mut = model.apply(variables, bv, speed, cmd,
                                    train=True, mutable=['batch_stats'])
            if isinstance(pred, tuple):
                pred = pred[0]
            per_sample = location_loss(pred, target_px)
            t_norm = target_px / (CROP_SIZE / 2.0) - 1.0
            err = jnp.abs(pred - t_norm)
            new_w = jnp.mean(jnp.sum(err * jnp.asarray(XY_BIAS), -1)
                             * jnp.asarray(DECAY), -1)
            return jnp.mean(per_sample), (mut['batch_stats'], new_w)

        (loss, (stats, new_w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        updates, opt = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        buf = replay_update_weights(buf, idx, new_w)
        return TrainState(st.step + 1, params, stats, opt), buf, loss

    # donate state + buffer; copy the incoming state first (its params
    # typically alias the rollout's variables — use-after-donate lesson)
    jit_step = jax.jit(train_step, donate_argnums=(0, 1))
    state = jax.tree.map(jnp.copy, state)
    key = jax.random.PRNGKey(seed * 9173 + 77)
    losses = []
    for _ in range(epochs):
        state = state._replace(opt_state=tx.init(state.params))
        buffer = replay_normalize(buffer)
        for _ in range(batches_per_epoch):
            key, k = jax.random.split(key)
            state, buffer, loss = jit_step(state, buffer, k)
            losses.append(loss)
    mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else -1.0
    return buffer, state, mean_loss


def priv_dagger_train_episode(buffer: ReplayBuffer, model,
                              state: TrainState, lr=1e-4,
                              epochs: int = 5, batch_size: int = 256,
                              batches_per_epoch: int = 100) -> TrainState:
    """Phase-2 loop shape on the birdview location loss."""
    from ..data.episode_store import unpack_birdview_jnp

    def train_step(st, batch):
        cmd = one_hot_command(batch['command'])
        bv = unpack_birdview_jnp(batch['bev_packed'])

        def loss_fn(params):
            variables = {'params': params, 'batch_stats': st.batch_stats}
            pred, mut = model.apply(variables, bv, batch['speed'], cmd,
                                    train=True, mutable=['batch_stats'])
            if isinstance(pred, tuple):
                pred = pred[0]
            per_sample = location_loss(pred, batch['location_px'])
            # refreshed importance weights (phase-2 recipe)
            t_norm = batch['location_px'] / (CROP_SIZE / 2.0) - 1.0
            err = jnp.abs(pred - t_norm)
            new_w = jnp.mean(jnp.sum(err * jnp.asarray(XY_BIAS), -1)
                             * jnp.asarray(DECAY), -1)
            return jnp.mean(per_sample), (mut['batch_stats'], new_w)

        (loss, (stats, new_w)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        updates, opt = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(st.step + 1, params, stats, opt), loss, new_w

    # donate + defensive copy: see dagger.py:288-295
    jit_step = jax.jit(train_step, donate_argnums=(0,))
    state = jax.tree.map(jnp.copy, state)
    losses = []
    for _ in range(epochs):
        tx = optax.adam(lr)
        state = state._replace(opt_state=tx.init(state.params))
        buffer.normalize_weights()
        for _ in range(batches_per_epoch):
            idx, raw = buffer.sample(batch_size)
            batch = {
                'bev_packed': jnp.asarray(raw['bev_packed']),
                'command': jnp.asarray(raw['command'], jnp.int32),
                'speed': jnp.asarray(raw['speed'], jnp.float32),
                'location_px': jnp.asarray(raw['location_px'],
                                           jnp.float32),
            }
            state, loss, new_w = jit_step(state, batch)
            buffer.update_weights(idx, np.asarray(new_w))
            losses.append(loss)
    return state, float(np.mean([np.asarray(l) for l in losses]))
