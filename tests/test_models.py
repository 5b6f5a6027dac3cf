import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.models import (BaselineCIL, BirdviewPolicy, ImagePolicy,
                            crop_birdview, one_hot_command, select_branch,
                            spatial_softmax)


def test_spatial_softmax_peak_locations():
    # A sharply peaked feature map -> soft-argmax recovers the peak coords.
    h, w = 48, 48
    feat = np.zeros((1, h, w, 1), np.float32)
    feat[0, 47, 0, 0] = 100.0   # bottom-left: y=+1, x=-1
    out = spatial_softmax(jnp.asarray(feat))
    np.testing.assert_allclose(out[0, 0], [-1.0, 1.0], atol=1e-3)

    feat = np.zeros((1, 40, 96, 1), np.float32)
    feat[0, 0, 95, 0] = 100.0   # top-right: x=+1, y=-1
    out = spatial_softmax(jnp.asarray(feat))
    np.testing.assert_allclose(out[0, 0], [1.0, -1.0], atol=1e-3)


def test_select_branch():
    branches = jnp.arange(2 * 4 * 5 * 2, dtype=jnp.float32).reshape(2, 4, 5, 2)
    oh = one_hot_command(jnp.array([1, 3]))
    out = select_branch(branches, oh)
    np.testing.assert_allclose(out[0], branches[0, 0])
    np.testing.assert_allclose(out[1], branches[1, 2])


def test_crop_birdview_geometry():
    bv = jnp.zeros((320, 320, 7))
    crop = crop_birdview(bv, dx=-10)
    assert crop.shape == (192, 192, 7)
    # agent crop rows 58..250, cols 64..256 (common.py:18-26 w/ dx=-10)
    marked = np.zeros((320, 320, 1), np.float32)
    marked[58, 64, 0] = 1.0
    out = crop_birdview(jnp.asarray(marked), dx=-10)
    assert out[0, 0, 0] == 1.0


@pytest.mark.parametrize('all_branch', [False, True])
def test_birdview_policy_shapes(all_branch):
    model = BirdviewPolicy(all_branch=all_branch)
    bv = jnp.zeros((2, 192, 192, 7))
    vel = jnp.ones((2,))
    cmd = one_hot_command(jnp.array([4, 1]))
    variables = model.init(jax.random.PRNGKey(0), bv, vel, cmd)
    out = model.apply(variables, bv, vel, cmd)
    if all_branch:
        sel, allb = out
        assert allb.shape == (2, 4, 5, 2)
    else:
        sel = out
    assert sel.shape == (2, 5, 2)
    assert bool(jnp.all(jnp.abs(sel) <= 1.0))


def test_image_policy_shapes():
    model = ImagePolicy(backbone='resnet18')  # smaller for test speed
    rgb = jnp.zeros((2, 160, 384, 3))
    vel = jnp.ones((2,))
    cmd = one_hot_command(jnp.array([2, 3]))
    variables = model.init(jax.random.PRNGKey(0), rgb, vel, cmd)
    out = model.apply(variables, rgb, vel, cmd)
    assert out.shape == (2, 5, 2)


def test_baseline_shapes():
    model = BaselineCIL()
    rgb = jnp.zeros((2, 160, 384, 3))
    vel = jnp.ones((2,))
    cmd = one_hot_command(jnp.array([2, 3]))
    variables = model.init(jax.random.PRNGKey(0), rgb, vel, cmd)
    control, speed = model.apply(variables, rgb, vel, cmd)
    assert control.shape == (2, 3)
    assert speed.shape == (2,)


def test_birdview_policy_vmap_consistency():
    """batch-of-1 == scalar under vmap (SURVEY.md section 4 plan)."""
    model = BirdviewPolicy()
    bv = jax.random.uniform(jax.random.PRNGKey(1), (3, 192, 192, 7))
    vel = jnp.array([1.0, 2.0, 3.0])
    cmd = one_hot_command(jnp.array([1, 2, 4]))
    variables = model.init(jax.random.PRNGKey(0), bv, vel, cmd)
    batched = model.apply(variables, bv, vel, cmd)
    single = model.apply(variables, bv[1:2], vel[1:2], cmd[1:2])
    np.testing.assert_allclose(batched[1], single[0], atol=2e-5)
