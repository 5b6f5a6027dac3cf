import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.engine import DrivingEnv, EnvConfig
from lbc_tpu.engine.lights import RED
from lbc_tpu.render.camera import render_camera, render_camera_state


@pytest.fixture(scope='module')
def env():
    return DrivingEnv(EnvConfig(town='Town01', n_vehicles=4,
                                n_pedestrians=4))


def _render(env, state, weather=1, light_state=None):
    m = env.map_data
    ls = light_state if light_state is not None else \
        jnp.full(m.light_pole_pos.shape[0], RED, jnp.int32)
    return np.asarray(render_camera(
        m, state.ego.pos, state.ego.yaw, state.npc.pos, state.npc.yaw,
        state.npc.active, state.walkers.pos, state.walkers.active,
        m.light_pole_pos, ls, jnp.asarray(weather, jnp.int32)))


def test_camera_shape_and_structure(env):
    state = env.reset_np(seed=0, start=12, target=60)
    img = _render(env, state)
    assert img.shape == (160, 384, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # sky on top, ground at bottom; the road ahead is grayish (R ~ G ~ B)
    bottom = img[150, 192]
    assert abs(bottom[0] - bottom[1]) < 0.1
    # sky differs from ground
    assert np.abs(img[5, 192] - bottom).sum() > 0.1


def test_camera_weather_changes_appearance(env):
    state = env.reset_np(seed=0, start=12, target=60)
    imgs = [_render(env, state, weather=w) for w in (1, 6, 8)]
    assert np.abs(imgs[0] - imgs[1]).mean() > 0.02   # hard rain darker
    # sunset (8) sky is redder than clear noon (1)
    sky1 = imgs[0][3, :, :].mean(0)
    sky8 = imgs[2][3, :, :].mean(0)
    assert sky8[0] - sky8[2] > sky1[0] - sky1[2]


def test_camera_vehicle_visible_ahead(env):
    state = env.reset_np(seed=0, start=12, target=60)
    fwd = np.array([np.cos(float(state.ego.yaw)),
                    np.sin(float(state.ego.yaw))])
    vpos = np.asarray(state.ego.pos) + 12.0 * fwd
    npc_pos = state.npc.pos.at[0].set(jnp.asarray(vpos))
    npc_yaw = state.npc.yaw.at[0].set(state.ego.yaw)
    npc_active = state.npc.active.at[:].set(
        jnp.arange(state.npc.pos.shape[0]) == 0)
    state2 = state._replace(npc=state.npc._replace(
        pos=npc_pos, yaw=npc_yaw, active=npc_active))
    img_with = _render(env, state2)
    state3 = state._replace(npc=state.npc._replace(
        active=jnp.zeros_like(state.npc.active)))
    img_without = _render(env, state3)
    diff = np.abs(img_with - img_without).sum(-1)
    assert (diff > 0.05).sum() > 50     # a visible box of pixels changed
    # changed pixels are around the image center (ahead)
    ys, xs = np.nonzero(diff > 0.05)
    assert 100 < xs.mean() < 280


def test_camera_jit_vmap(env):
    from lbc_tpu.engine import stack_states
    states = [env.reset_np(seed=s, start=10 + s, target=50) for s in
              range(2)]
    batch = stack_states(states)
    fn = jax.jit(jax.vmap(lambda s: render_camera_state(env.map_data, s)))
    out = fn(batch)
    assert out.shape == (2, 160, 384, 3)
