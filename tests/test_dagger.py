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
        assert np.mean(rgb_diff > 2) < 1e-3
        np.testing.assert_array_equal(fa['bev_packed'][i],
                                      fb['bev_packed'][i])
