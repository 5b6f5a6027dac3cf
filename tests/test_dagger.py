"""Tiny end-to-end DAgger smoke: rollout collects, buffer fills, one
training epoch runs and returns finite loss."""
import jax
import numpy as np
import pytest

from lbc_tpu.data import ReplayBuffer
from lbc_tpu.train import (dagger_rollout, dagger_train_episode,
                           init_birdview_training, init_image_training,
                           make_birdview_model, make_image_model)


def test_dagger_end_to_end_small():
    teacher = make_birdview_model(all_branch=True)
    t_state, _ = init_birdview_training(jax.random.PRNGKey(0), teacher)
    t_vars = {'params': t_state.params,
              'batch_stats': t_state.batch_stats}
    student = make_image_model(backbone='resnet18')
    s_state, _ = init_image_training(jax.random.PRNGKey(1), student)
    s_vars = {'params': s_state.params,
              'batch_stats': s_state.batch_stats}

    buffer = ReplayBuffer(capacity=5000, seed=0)
    added = dagger_rollout(
        buffer, student, s_vars, teacher, t_vars, episode=0,
        episode_length=40, n_vehicles=2, n_pedestrians=2,
        weathers=(1, 3), seed=0, pose_pairs=[(35, 39)])
    assert added > 0
    assert len(buffer) == added

    s_state2 = dagger_train_episode(
        buffer, student, s_state, teacher, t_vars, epochs=1,
        batch_size=4, batches_per_epoch=2)
    assert int(s_state2.step) == 2
    p0 = np.asarray(jax.tree_util.tree_leaves(s_state.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(s_state2.params)[0])
    assert np.abs(p1 - p0).max() > 0     # parameters moved


def test_dagger_batched_rollout_matches(tmp_path):
    """Batched (Pallas) DAgger rollout == per-env rollout: same frames
    added, same measurements/commands; renders agree up to boundary
    pixels."""
    teacher = make_birdview_model(all_branch=True)
    t_state, _ = init_birdview_training(jax.random.PRNGKey(0), teacher)
    t_vars = {'params': t_state.params,
              'batch_stats': t_state.batch_stats}
    student = make_image_model(backbone='resnet18')
    s_state, _ = init_image_training(jax.random.PRNGKey(1), student)
    s_vars = {'params': s_state.params,
              'batch_stats': s_state.batch_stats}

    kw = dict(episode=0, episode_length=25, n_vehicles=2,
              n_pedestrians=2, weathers=(1, 3), seed=0,
              pose_pairs=[(35, 39)])
    buf_a = ReplayBuffer(capacity=5000, seed=0)
    n_a = dagger_rollout(buf_a, student, s_vars, teacher, t_vars,
                         batched=False, **kw)
    buf_b = ReplayBuffer(capacity=5000, seed=0)
    n_b = dagger_rollout(buf_b, student, s_vars, teacher, t_vars,
                         batched=True, pallas_interpret=True, **kw)
    assert n_a == n_b > 0
    fa, fb = buf_a._fields, buf_b._fields
    for i in (0, n_a - 1):
        assert fa['command'][i] == fb['command'][i]
        np.testing.assert_allclose(fa['speed'][i], fb['speed'][i],
                                   atol=1e-5)
        np.testing.assert_allclose(fa['teacher_locs'][i],
                                   fb['teacher_locs'][i], atol=1e-4)
        rgb_diff = np.abs(fa['rgb'][i].astype(int)
                          - fb['rgb'][i].astype(int))
        # ground albedo texture hashes integer cells of the ground-point
        # coords; the two paths compute those coords with different fp
        # schedules (sub-mm differences), so ~0.2-0.5% of pixels flip to
        # a neighboring texture cell — bounded, boundary-only noise
        assert np.mean(rgb_diff > 2) < 1e-2
        # the student drives on that rgb, so the two paths' ego poses
        # micro-diverge (sub-mm) — the ego-centric BEV crop can then
        # flip boundary pixels of any channel (observed: ~15 lane-edge
        # pixels, 0.04%); bounded boundary noise, same cause as rgb
        bev_diff = fa['bev_packed'][i] != fb['bev_packed'][i]
        assert np.mean(bev_diff) < 2e-3


# ---------------------------------------------------------------------------
# Device-resident replay buffer (train/device_replay.py)

def test_device_replay_semantics():
    import jax.numpy as jnp
    from lbc_tpu.train.device_replay import (replay_add, replay_init,
                                             replay_normalize,
                                             replay_sample_idx,
                                             replay_top_k,
                                             replay_update_weights)
    rng = np.random.RandomState(0)

    def frames(m, w):
        fields = {'rgb': jnp.asarray(rng.randint(0, 255, (m, 160, 384, 3),
                                                 np.uint8)),
                  'teacher_branches': jnp.asarray(rng.rand(m, 4, 5, 2),
                                                  jnp.float32),
                  'command': jnp.asarray(rng.randint(1, 5, m), jnp.int32),
                  'speed': jnp.asarray(rng.rand(m), jnp.float32)}
        return fields, jnp.asarray(w, jnp.float32)

    buf = replay_init(6)
    r0 = frames(4, [0.5, 0.1, 0.9, 0.3])
    buf = replay_add(buf, *r0, jnp.asarray([True, True, False, True]))
    assert int(buf.size) == 3           # invalid frame dropped
    # slot order: valid frames in rollout order into empty slots
    np.testing.assert_array_equal(np.asarray(buf.rgb[0]),
                                  np.asarray(r0[0]['rgb'][0]))
    np.testing.assert_array_equal(np.asarray(buf.rgb[2]),
                                  np.asarray(r0[0]['rgb'][3]))
    assert float(buf.weight[1]) == pytest.approx(0.1)

    # overflow: 5 new valid frames, capacity 6 with 3 used -> the 2
    # lowest-weight occupied slots are evicted after empties fill
    r1 = frames(5, [1.0, 1.1, 1.2, 1.3, 1.4])
    buf = replay_add(buf, *r1, jnp.asarray([True] * 5))
    assert int(buf.size) == 6
    w = np.sort(np.asarray(buf.weight))
    np.testing.assert_allclose(w, [0.5, 1.0, 1.1, 1.2, 1.3, 1.4],
                               atol=1e-6)   # 0.1 and 0.3 evicted

    # importance sampling prefers heavy entries
    idx = replay_sample_idx(buf, jax.random.PRNGKey(0), 512)
    idx = np.asarray(idx)
    assert idx.min() >= 0 and idx.max() < 6
    heavy = int(np.argmax(np.asarray(buf.weight)))
    light = int(np.argmin(np.asarray(buf.weight)))
    counts = np.bincount(idx, minlength=6)
    assert counts[heavy] > counts[light]

    # weight refresh: staged then promoted
    buf2 = replay_update_weights(buf, jnp.asarray([0, 1]),
                                 jnp.asarray([9.0, 8.0]))
    assert float(buf2.weight[0]) != 9.0
    buf2 = replay_normalize(buf2)
    assert float(buf2.weight[0]) == 9.0 and float(buf2.weight[1]) == 8.0

    # top-k audit returns the heaviest entries
    topf, wk = replay_top_k(buf2, 2)
    assert float(wk[0]) == 9.0 and float(wk[1]) == 8.0
    assert topf['rgb'].shape == (2, 160, 384, 3)


def test_dagger_device_end_to_end_small():
    import jax.numpy as jnp
    from lbc_tpu.train import (dagger_rollout_device,
                               dagger_train_episode_device)
    from lbc_tpu.train.device_replay import replay_init

    teacher = make_birdview_model(all_branch=True)
    t_state, _ = init_birdview_training(jax.random.PRNGKey(0), teacher)
    t_vars = {'params': t_state.params,
              'batch_stats': t_state.batch_stats}
    student = make_image_model(backbone='resnet18')
    s_state, _ = init_image_training(jax.random.PRNGKey(1), student)
    s_vars = {'params': s_state.params,
              'batch_stats': s_state.batch_stats}

    buf = replay_init(200)
    buf, added = dagger_rollout_device(
        buf, student, s_vars, teacher, t_vars, episode=0,
        episode_length=40, n_vehicles=2, n_pedestrians=2,
        weathers=(1, 3), seed=0, pose_pairs=[(35, 39)])
    assert added > 0
    assert int(buf.size) == min(added, 200)
    assert np.isfinite(np.asarray(buf.teacher_branches[:2])).all()

    buf, s_state2, loss = dagger_train_episode_device(
        buf, student, s_state, epochs=1, batch_size=4,
        batches_per_epoch=2)
    assert np.isfinite(loss)
    assert int(s_state2.step) == 2
    p0 = np.asarray(jax.tree_util.tree_leaves(s_state.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(s_state2.params)[0])
    assert np.abs(p1 - p0).max() > 0


def test_dagger_device_matches_host_buffer():
    """Host and device rollout paths agree on what gets stored (weights,
    validity trimming, teacher waypoints)."""
    from lbc_tpu.train import dagger_rollout_device
    from lbc_tpu.train.device_replay import replay_init

    teacher = make_birdview_model(all_branch=True)
    t_state, _ = init_birdview_training(jax.random.PRNGKey(0), teacher)
    t_vars = {'params': t_state.params,
              'batch_stats': t_state.batch_stats}
    student = make_image_model(backbone='resnet18')
    s_state, _ = init_image_training(jax.random.PRNGKey(1), student)
    s_vars = {'params': s_state.params,
              'batch_stats': s_state.batch_stats}

    kw = dict(episode=0, episode_length=25, n_vehicles=2,
              n_pedestrians=2, weathers=(1, 3), seed=0,
              pose_pairs=[(35, 39)], batched=False)
    host = ReplayBuffer(capacity=5000, seed=0)
    n_h = dagger_rollout(host, student, s_vars, teacher, t_vars, **kw)
    dev = replay_init(5000)
    dev, n_d = dagger_rollout_device(dev, student, s_vars, teacher,
                                     t_vars, **kw)
    assert n_h == n_d == int(dev.size)
    hw = np.sort(np.asarray(host._weights[:n_h]))
    dw = np.sort(np.asarray(dev.weight[:n_d]))
    np.testing.assert_allclose(hw, dw, atol=1e-5)
