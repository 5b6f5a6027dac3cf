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
