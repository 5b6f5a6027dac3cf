"""Phase 0/1 distillation + DAgger machinery tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.control.waypoint_controller import (
    birdview_locations_to_targets, unproject_image_waypoints)
from lbc_tpu.train import (bev_to_image, image_to_bev, init_image_training,
                           make_image_model, phase0_train_step,
                           phase1_train_step, sample_weight)
from lbc_tpu.train.birdview_trainer import (init_birdview_training,
                                            make_birdview_model)


def test_coord_converters_inverse():
    """bev->image->bev is identity for points on the ground in front of
    the camera (the two converters invert the same pinhole model)."""
    # waypoints 5..25 m ahead, small lateral offsets
    fwd = np.linspace(5, 25, 5)
    lat = np.linspace(-2, 2, 5)
    col = (96 + lat * 5) / 96.0 - 1.0
    row = (192 - fwd * 5) / 96.0 - 1.0
    bev = jnp.asarray(np.stack([col, row], -1))[None]
    img = bev_to_image(bev)
    assert bool(jnp.all(jnp.abs(img) <= 1.0))
    back = image_to_bev(img)
    np.testing.assert_allclose(np.asarray(back), np.asarray(bev),
                               atol=1e-3)


def test_unproject_project_consistency():
    """The training-side bev_to_image and the agent-side unproject used at
    eval time agree (image.py:198-219 round trip)."""
    fwd = np.array([4.0, 8.0, 12.0, 16.0, 20.0])
    lat = np.array([-1.0, 0.0, 1.0, 2.0, -2.0])
    col = (96 + lat * 5) / 96.0 - 1.0
    row = (192 - fwd * 5) / 96.0 - 1.0
    bev = jnp.asarray(np.stack([col, row], -1))
    img = bev_to_image(bev[None])[0]
    targets = unproject_image_waypoints(img)
    np.testing.assert_allclose(np.asarray(targets[:, 0]), fwd, atol=1e-2)
    np.testing.assert_allclose(np.asarray(targets[:, 1]), lat, atol=1e-2)


@pytest.fixture(scope='module')
def nets():
    teacher = make_birdview_model(all_branch=True)
    t_state, _ = init_birdview_training(jax.random.PRNGKey(0), teacher)
    t_vars = {'params': t_state.params,
              'batch_stats': t_state.batch_stats}
    student = make_image_model(backbone='resnet18')
    s_state, tx = init_image_training(jax.random.PRNGKey(1), student)
    return teacher, t_vars, student, s_state, tx


def _batch(rng, b=4):
    return {
        'rgb': jnp.asarray(rng.rand(b, 160, 384, 3), jnp.float32),
        'birdview': jnp.asarray(rng.rand(b, 192, 192, 7) > 0.8,
                                jnp.float32),
        'command': jnp.asarray(rng.randint(1, 5, b), jnp.int32),
        'speed': jnp.asarray(rng.rand(b) * 8, jnp.float32),
    }


def test_phase0_step_runs_and_learns(nets):
    teacher, t_vars, student, s_state, tx = nets
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    step = jax.jit(lambda s, b: phase0_train_step(
        s, b, student, tx, teacher, t_vars))
    s_state, m0 = step(s_state, batch)
    for _ in range(8):
        s_state, m = step(s_state, batch)
    assert float(m['loss']) < float(m0['loss'])


def test_phase1_step_runs(nets):
    teacher, t_vars, student, s_state, tx = nets
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    step = jax.jit(lambda s, b, k: phase1_train_step(
        s, b, student, tx, teacher, t_vars, k, speed_noise=1.0))
    s_state, m = step(s_state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m['loss']))


def test_sample_weight_shape_and_order():
    t = np.zeros((10, 5, 2), np.float32)
    s_close = t + 0.01
    s_far = t + 0.5
    w_close = sample_weight(s_close, t)
    w_far = sample_weight(s_far, t)
    assert w_close.shape == (10,)
    assert np.all(w_far > w_close)


# ---------------------------------------------------------------------------
# Device-resident training (train/resident.py)

def _fake_rgb_dataset(tmp_path, n_eps=3, n=40):
    from lbc_tpu.data.episode_store import write_episode
    rng = np.random.RandomState(7)
    for e in range(n_eps):
        meas = np.zeros((n, 17), np.float32)
        for i in range(n):
            meas[i, 0] = 4.0 * 0.1 * i
            meas[i, 1] = 30.0 + e
            meas[i, 3] = 1.0
            meas[i, 5] = 4.0
            meas[i, 11] = 1 + (i % 4)
        bv = (rng.rand(n, 320, 320, 7) > 0.95).astype(np.float32)
        rgb = rng.randint(0, 255, (n, 160, 384, 3), np.uint8)
        write_episode(tmp_path / f'ep{e}', birdview=bv,
                      measurements=meas, control=np.zeros((n, 3),
                                                          np.float32),
                      rgb=rgb)
    from lbc_tpu.data import FrameDataset, SampleConfig
    return FrameDataset(tmp_path, SampleConfig(include_rgb=True))


def test_resident_upload_matches_sampler(tmp_path):
    from lbc_tpu.train.resident import upload_dataset
    ds = _fake_rgb_dataset(tmp_path)
    data = upload_dataset(ds, val_episodes=1, chunk_frames=16)
    assert data.rgb.shape[0] == len(ds.index)
    # last episode held out for validation
    usable = len(ds.index) // 3
    assert data.n_train == 2 * usable

    from lbc_tpu.data.episode_store import unpack_birdview
    rng = np.random.RandomState(0)
    for idx in [0, usable + 3, len(ds.index) - 1]:
        ref = ds.get_image_sample(idx, rng)
        np.testing.assert_array_equal(
            np.asarray(data.rgb[idx]),
            (ref['rgb'] * 255).astype(np.uint8))
        np.testing.assert_array_equal(
            unpack_birdview(np.asarray(data.bev_crop_packed[idx])),
            ref['birdview'])
        assert int(data.command[idx]) == ref['command']
        assert float(data.speed[idx]) == pytest.approx(ref['speed'])


def test_resident_steps_run_and_learn(tmp_path, nets):
    from lbc_tpu.train.resident import (make_resident_step,
                                        make_resident_val_step,
                                        upload_dataset)
    from lbc_tpu.data.augment import schedule_params
    teacher, t_vars, student, s_state, tx = nets
    ds = _fake_rgb_dataset(tmp_path, n_eps=2, n=40)
    data = upload_dataset(ds, val_episodes=1, chunk_frames=16)

    for phase in (0, 1):
        step = make_resident_step(student, tx, teacher, t_vars, phase,
                                  batch_size=4, speed_noise=1.0,
                                  augment=(phase == 1))
        state = jax.tree.map(jnp.copy, s_state)
        params = schedule_params('super_hard', 0)
        losses = []
        for i in range(3):
            state, loss = step(state, data,
                               jax.random.PRNGKey(i), params)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert int(state.step) == int(s_state.step) + 3

        val = make_resident_val_step(student, teacher, t_vars, phase,
                                     batch_size=4)
        v = float(val(state, data, data.n_train))
        assert np.isfinite(v)
