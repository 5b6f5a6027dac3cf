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


def test_batched_privileged_agent_bf16_close_to_f32():
    """compute_dtype=bfloat16 inference stays close to f32 (the bench/eval
    fast path casts params once and activations per step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.agents.privileged import (make_privileged_agent_batched,
                                           privileged_init)
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.models import BirdviewPolicy

    env = DrivingEnv(EnvConfig(town='Town01', n_vehicles=2,
                               n_pedestrians=2))
    batch = stack_states([env.reset_np(seed=s, start=10 + s, target=60)
                          for s in range(2)])
    obs = jax.vmap(env.observe)(batch)
    agents = jax.tree.map(lambda x: jnp.stack([x] * 2), privileged_init())

    model = BirdviewPolicy()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 192, 192, 7)), jnp.zeros((1,)),
                           jnp.zeros((1, 4)))
    # CPU has no TPU Pallas lowering; interpret via monkey helper: call the
    # step fns' underlying pieces through the public path on CPU works
    # because render_bev_crop_pallas accepts interpret only via wrapper --
    # so compare the net+controller part directly on a rendered crop.
    from lbc_tpu.constants import AGENT_CROP_DX
    from lbc_tpu.models import crop_birdview, one_hot_command
    from lbc_tpu.render.bev import render_bev_state
    from lbc_tpu.control import birdview_agent_control

    bev = jax.vmap(lambda s: render_bev_state(env.map_data, s))(batch)
    crop = jax.vmap(lambda b: crop_birdview(b, dx=AGENT_CROP_DX))(bev)
    cmd = one_hot_command(obs['command'])

    loc32 = model.apply(variables, crop, obs['speed'], cmd)
    var16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)
    loc16 = model.apply(var16, crop.astype(jnp.bfloat16),
                        obs['speed'].astype(jnp.bfloat16),
                        cmd.astype(jnp.bfloat16)).astype(jnp.float32)
    assert np.abs(np.asarray(loc16) - np.asarray(loc32)).max() < 0.1

    c32, _ = birdview_agent_control(loc32, obs['speed'], obs['command'],
                                    agents.controller)
    c16, _ = birdview_agent_control(loc16, obs['speed'], obs['command'],
                                    agents.controller)
    assert np.abs(np.asarray(c16) - np.asarray(c32)).max() < 0.3


def test_conv_transpose_phase_equivalence():
    """conv_transpose_s2_same / ConvTransposeS2 must reproduce
    nn.ConvTranspose((3,3), strides 2, SAME) exactly: same param
    names/shapes (checkpoint-compatible) and same values to fp noise.
    The decomposition exists because XLA lowers a stride-2 transposed
    conv via input dilation (half the MACs are zeros on the MXU)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from lbc_tpu.models.layers import (ConvTransposeS2,
                                       conv_transpose_s2_same)

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 6, 7, 5))      # odd width too
    ref = nn.ConvTranspose(4, (3, 3), strides=(2, 2), padding='SAME')
    v = ref.init(key, x)
    want = ref.apply(v, x)

    got = conv_transpose_s2_same(x, v['params']['kernel'],
                                 v['params']['bias'])
    assert want.shape == got.shape == (2, 12, 14, 4)
    assert float(jnp.max(jnp.abs(want - got))) < 1e-5

    mod = ConvTransposeS2(4)
    v2 = mod.init(key, x)
    # identical param tree -> old checkpoints load unchanged
    assert jax.tree.map(jnp.shape, v2) == jax.tree.map(jnp.shape, v)
    got2 = mod.apply(v, x)
    assert float(jnp.max(jnp.abs(want - got2))) < 1e-5
