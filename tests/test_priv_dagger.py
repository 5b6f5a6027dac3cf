"""Privileged-agent DAgger: fork-expert labels + phase-2-style training.

Label correctness is pinned by a physical property: forked futures start
from the exact visited state, so when the EXPERT itself drives the
rollout (episode 0 has p_student=0.5; we force expert control by passing
an untrained student whose mixing we bypass via beta handling below), the
fork labels at a state the expert visits equal the positions the expert
actually reaches later in that same rollout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.constants import CROP_SIZE, GAP, STEPS
from lbc_tpu.data import ReplayBuffer
from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
from lbc_tpu.train import init_birdview_training, make_birdview_model
from lbc_tpu.train.priv_dagger import (fork_expert_futures,
                                       future_to_crop_px,
                                       priv_dagger_rollout,
                                       priv_dagger_train_episode)


def test_fork_labels_match_expert_rollout():
    """Fork the expert from its own trajectory: the forked future at tick
    t must equal the positions the same expert reaches at t+GAP*k."""
    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine.rollout import make_rollout

    env = DrivingEnv(EnvConfig(town='Town01', n_vehicles=0,
                               n_pedestrians=0))
    st = env.reset_np(seed=0, start=35, target=39, weather=1)
    batch = stack_states([st])
    agents = jax.tree.map(lambda x: jnp.stack([x]), expert_init())

    def agent_fn(map_data, env_state, obs, agent):
        return expert_step(map_data, env_state, agent)

    def collect(env_state, obs, control, aux):
        return {'state': env_state, 'pos': env_state.ego.pos}

    T = 30 + GAP * STEPS + 1
    rollout = make_rollout(env, agent_fn, T, collect=collect)
    _, _, _, recs = rollout(batch, agents)
    pos_t = np.asarray(recs['pos'])[:, 0]             # (T, 2)

    # fork from tick 10's state
    t0 = 10
    fork_state = jax.tree.map(lambda x: x[t0], recs['state'])
    futures = np.asarray(fork_expert_futures(env, fork_state))[0]

    expect = np.stack([pos_t[t0 + GAP * (k + 1)] for k in range(STEPS)])
    # forked expert starts with fresh PID state; the original had ~10
    # ticks of integral history — allow a small tolerance
    assert np.abs(futures - expect).max() < 0.5, \
        (futures, expect)


def test_future_to_crop_px_geometry():
    """Matches the offline dataset label transform at zero jitter
    (data/datasets.py:world_to_crop_pixel with dx=0, dy=-PIXEL_OFFSET):
    ego anchor (col 96, row 192), 5 px/m, dataset lateral handedness."""
    from lbc_tpu.constants import PIXEL_OFFSET
    from lbc_tpu.data.datasets import world_to_crop_pixel

    ego = jnp.array([10.0, 20.0])
    yaw = jnp.array(0.7)
    pts = jnp.array([[[14.0, 25.0], [12.0, 18.5], [10.0, 20.0]]])
    px = np.asarray(future_to_crop_px(pts, ego[None], yaw[None]))[0]
    for k in range(3):
        ex, ey = world_to_crop_pixel(
            float(pts[0, k, 0]), float(pts[0, k, 1]),
            float(ego[0]), float(ego[1]),
            float(np.cos(yaw)), float(np.sin(yaw)),
            dx=0, dy=-PIXEL_OFFSET)
        np.testing.assert_allclose(px[k], [ex, ey], atol=1e-4)
    # ego's own position lands on the anchor
    np.testing.assert_allclose(px[2], [96.0, 192.0], atol=1e-4)


def test_priv_dagger_end_to_end_small():
    model = make_birdview_model()
    state, _ = init_birdview_training(jax.random.PRNGKey(0), model)
    variables = {'params': state.params,
                 'batch_stats': state.batch_stats}

    buffer = ReplayBuffer(capacity=5000, seed=0)
    added = priv_dagger_rollout(
        buffer, model, variables, episode=0, episode_length=30,
        n_vehicles=2, n_pedestrians=2, n_envs=2, seed=0,
        pose_pairs=[(35, 39)])
    assert added > 0
    assert len(buffer) == added

    # labels are plausible pixels: mostly inside the padded crop window
    _, raw = buffer.sample(16)
    labels = raw['location_px']
    assert labels.shape[1:] == (STEPS, 2)
    assert np.isfinite(labels).all()
    assert (np.abs(labels - CROP_SIZE / 2) < 3 * CROP_SIZE).all()

    state2, loss = priv_dagger_train_episode(
        buffer, model, state, epochs=1, batch_size=4,
        batches_per_epoch=2)
    assert np.isfinite(loss)
    assert int(state2.step) == 2
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    assert np.abs(p1 - p0).max() > 0
    # the incoming state must NOT be donated away (use-after-donate
    # regression guard, mirrors round-2 dagger bug)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])).all()


def test_priv_dagger_device_matches_host():
    """Device-resident path (priv_dagger_rollout_device) stores the same
    weights/labels/frame-count as the host path, and trains."""
    from lbc_tpu.train.device_replay import replay_init
    from lbc_tpu.train.priv_dagger import (PRIV_SPECS,
                                           priv_dagger_rollout_device,
                                           priv_dagger_train_episode_device)

    model = make_birdview_model()
    state, _ = init_birdview_training(jax.random.PRNGKey(0), model)
    variables = {'params': state.params,
                 'batch_stats': state.batch_stats}

    kw = dict(episode=0, episode_length=25, n_vehicles=2,
              n_pedestrians=2, n_envs=2, seed=0, pose_pairs=[(35, 39)])
    host = ReplayBuffer(capacity=5000, seed=0)
    n_h = priv_dagger_rollout(host, model, variables, **kw)
    dev = replay_init(5000, specs=PRIV_SPECS)
    dev, n_d = priv_dagger_rollout_device(dev, model, variables, **kw)
    assert n_h == n_d == int(dev.size)

    hw = np.sort(np.asarray(host._weights[:n_h]))
    dw = np.sort(np.asarray(dev.weight[:n_d]))
    np.testing.assert_allclose(hw, dw, atol=1e-5)
    hl = np.sort(np.stack(host._fields['location_px']).ravel())
    dl = np.sort(np.asarray(dev.fields['location_px'][:n_d]).ravel())
    np.testing.assert_allclose(hl, dl, atol=1e-3)

    dev, state2, loss = priv_dagger_train_episode_device(
        dev, model, state, epochs=1, batch_size=4, batches_per_epoch=2)
    assert np.isfinite(loss)
    assert int(state2.step) == 2
    # incoming state survives (use-after-donate guard)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])).all()
