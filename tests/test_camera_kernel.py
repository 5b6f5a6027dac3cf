"""Fused Pallas camera kernel vs the pure-XLA renderer (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
from lbc_tpu.ops.camera_kernel import render_camera_state_pallas
from lbc_tpu.render.camera import render_camera_state


@pytest.fixture(scope='module')
def env():
    return DrivingEnv(EnvConfig(town='Town01', n_vehicles=8,
                                n_pedestrians=8))


def _batch(env, n=2, weathers=(1, 8)):
    states = [env.reset_np(seed=s, start=10 + s, target=50 + 3 * s)
              for s in range(n)]
    batch = stack_states(states)
    ep = batch.episode._replace(
        weather=jnp.asarray(weathers[:n], jnp.int32))
    return batch._replace(episode=ep)


def test_camera_kernel_matches_xla(env):
    batch = _batch(env)
    ref = jax.vmap(lambda s: render_camera_state(env.map_data, s))(batch)
    out = render_camera_state_pallas(env.map_data, batch, interpret=True)
    assert out.shape == ref.shape == (2, 160, 384, 3)
    # The kernel compares squared distances where the XLA path compares
    # norms — identical math, but fp rounding can flip classification of
    # single pixels exactly on a capsule boundary. Demand agreement
    # everywhere except a vanishing set of boundary pixels.
    diff = np.abs(np.asarray(out) - np.asarray(ref)).max(-1)
    assert float(np.mean(diff)) < 1e-4
    assert float(np.mean(diff > 1e-3)) < 5e-4
    assert float(np.quantile(diff, 0.999)) < 2e-5


def test_batched_image_agent_matches_vmapped(env):
    """make_image_agent_batched (Pallas camera) == vmap(make_image_agent)
    on controls, up to boundary-pixel render noise through the conv net."""
    import jax.random as jr

    from lbc_tpu.agents.image import (image_agent_init, make_image_agent,
                                      make_image_agent_batched)
    from lbc_tpu.train.image_trainer import (init_image_training,
                                             make_image_model)

    model = make_image_model(backbone='resnet34', all_branch=False)
    state, _ = init_image_training(jr.PRNGKey(0), model)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    batch = _batch(env)
    obs = jax.vmap(env.observe)(batch)
    agents = jax.tree.map(lambda x: jnp.stack([x] * 2),
                          image_agent_init())

    single = make_image_agent(model, variables)
    ctrl_ref, _, (loc_ref, _) = jax.vmap(
        lambda s, o, a: single(env.map_data, s, o, a))(batch, obs, agents)
    batched = make_image_agent_batched(model, variables, interpret=True)
    ctrl, _, (loc, _) = batched(env.map_data, batch, obs, agents)
    np.testing.assert_allclose(np.asarray(loc), np.asarray(loc_ref),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(ctrl), np.asarray(ctrl_ref),
                               atol=5e-3)


def test_camera_kernel_actors_visible(env):
    """A vehicle planted ahead shows up through the kernel path too."""
    state = env.reset_np(seed=0, start=12, target=60)
    fwd = jnp.stack([jnp.cos(state.ego.yaw), jnp.sin(state.ego.yaw)])
    npc = state.npc._replace(
        pos=state.npc.pos.at[0].set(state.ego.pos + 12.0 * fwd),
        yaw=state.npc.yaw.at[0].set(state.ego.yaw),
        active=jnp.arange(state.npc.pos.shape[0]) == 0)
    with_v = stack_states([state._replace(npc=npc)])
    without = stack_states([state._replace(npc=state.npc._replace(
        active=jnp.zeros_like(state.npc.active)))])
    img_w = np.asarray(render_camera_state_pallas(env.map_data, with_v,
                                                  interpret=True))[0]
    img_o = np.asarray(render_camera_state_pallas(env.map_data, without,
                                                  interpret=True))[0]
    diff = np.abs(img_w - img_o).sum(-1)
    assert (diff > 0.05).sum() > 50
