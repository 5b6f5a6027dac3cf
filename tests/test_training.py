"""Training pipeline tests: loss math, sharded train step, e2e smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.models import one_hot_command
from lbc_tpu.parallel import make_mesh, replicated, shard_batch
from lbc_tpu.train import (birdview_train_step, init_birdview_training,
                           location_loss, make_birdview_model,
                           make_sharded_train_step)


def test_location_loss_zero_when_exact():
    target_px = jnp.array([[[96.0, 192.0], [96.0, 142.0], [96.0, 92.0],
                            [96.0, 42.0], [96.0, 0.0]]])
    pred = target_px / 96.0 - 1.0
    loss = location_loss(pred, target_px)
    assert float(loss[0]) < 1e-6


def _tiny_batch(rng, b=8):
    return {
        'birdview': jnp.asarray(rng.rand(b, 192, 192, 7), jnp.float32),
        'location_px': jnp.asarray(
            rng.rand(b, 5, 2) * 100 + 40, jnp.float32),
        'command': jnp.asarray(rng.randint(1, 5, b), jnp.int32),
        'speed': jnp.asarray(rng.rand(b) * 8, jnp.float32),
    }


def test_train_step_reduces_loss():
    model = make_birdview_model()
    state, tx = init_birdview_training(jax.random.PRNGKey(0), model,
                                       lr=3e-4)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)
    step = jax.jit(lambda s, b: birdview_train_step(s, b, model, tx))
    state, m0 = step(state, batch)
    for _ in range(12):
        state, m = step(state, batch)    # overfit one batch
    assert float(m['loss']) < float(m0['loss'])


def test_sharded_train_step_8_devices():
    """Data-parallel step over the virtual 8-device CPU mesh matches the
    single-device step numerically."""
    assert len(jax.devices()) == 8
    model = make_birdview_model()
    state, tx = init_birdview_training(jax.random.PRNGKey(1), model)
    rng = np.random.RandomState(1)
    batch = _tiny_batch(rng, b=16)

    single = jax.jit(lambda s, b: birdview_train_step(s, b, model, tx))
    s1, m1 = single(state, batch)

    mesh = make_mesh(8)
    with mesh:
        sharded_step = make_sharded_train_step(mesh, model, tx)
        state_r = jax.device_put(state, replicated(mesh))
        batch_s = shard_batch(mesh, batch)
        s2, m2 = sharded_step(state_r, batch_s)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)
    # params after one step agree; Adam's step-1 update is +-lr with the
    # sign of the gradient, so near-zero grads may flip sign between
    # cross-device reduction orders — compare in aggregate.
    p1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0]).ravel()
    p2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0]).ravel()
    assert np.mean(np.abs(p1 - p2)) < 2e-5
    assert np.mean(np.sign(p1) == np.sign(p2)) > 0.98


def test_checkpoint_roundtrip(tmp_path):
    from lbc_tpu.train.checkpoints import (latest_checkpoint,
                                           load_checkpoint,
                                           save_checkpoint)
    model = make_birdview_model()
    state, tx = init_birdview_training(jax.random.PRNGKey(2), model)
    save_checkpoint(tmp_path, state, 4)
    assert latest_checkpoint(tmp_path).name == 'model-4'
    restored = load_checkpoint(latest_checkpoint(tmp_path), state)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_config_contract(tmp_path):
    from lbc_tpu.utils.experiment import load_config, save_config
    cfg = {'model_args': {'model': 'birdview_dian', 'backbone': 'resnet18'},
           'agent_args': {'steer_points': {'1': 3}}}
    save_config(tmp_path, cfg)
    loaded = load_config(tmp_path / 'config.json')
    assert loaded['model_args']['model'] == 'birdview_dian'

    from lbc_tpu.models import get_model
    model = get_model(loaded['model_args']['model'],
                      backbone=loaded['model_args']['backbone'])
    assert model is not None
