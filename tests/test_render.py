import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.constants import (EGO_WINDOW_COL, EGO_WINDOW_ROW,
                               PIXELS_PER_METER_RENDER)
from lbc_tpu.engine import DrivingEnv, EnvConfig
from lbc_tpu.engine.lights import GREEN, RED
from lbc_tpu.render import pixel_world_coords, render_bev


@pytest.fixture(scope='module')
def env():
    return DrivingEnv(EnvConfig(town='Town01', n_vehicles=4,
                                n_pedestrians=4))


def _render(env, state, npc_pos=None, npc_yaw=None, npc_active=None,
            walker_pos=None, walker_active=None, light_state=None):
    m = env.map_data
    npc_pos = state.npc.pos if npc_pos is None else npc_pos
    npc_yaw = state.npc.yaw if npc_yaw is None else npc_yaw
    npc_active = state.npc.active if npc_active is None else npc_active
    walker_pos = state.walkers.pos if walker_pos is None else walker_pos
    walker_active = (state.walkers.active if walker_active is None
                     else walker_active)
    if light_state is None:
        light_state = jnp.full(m.light_pole_pos.shape[0], RED, jnp.int32)
    return np.asarray(render_bev(
        m, state.ego.pos, state.ego.yaw, npc_pos, npc_yaw, npc_active,
        walker_pos, walker_active, m.light_pole_pos, light_state))


def test_pixel_world_geometry():
    ego = jnp.array([100.0, 200.0])
    yaw = jnp.asarray(0.3)
    w = pixel_world_coords(ego, yaw)
    fwd = np.array([np.cos(0.3), np.sin(0.3)])
    # ego pixel maps to ego position
    np.testing.assert_allclose(
        np.asarray(w[EGO_WINDOW_ROW, EGO_WINDOW_COL]), np.asarray(ego),
        atol=1e-4)
    # 45 px up = 10 m ahead at 4.5 px/m
    np.testing.assert_allclose(
        np.asarray(w[EGO_WINDOW_ROW - 45, EGO_WINDOW_COL]),
        np.asarray(ego) + 10 * fwd, atol=1e-4)


def test_bev_road_under_ego(env):
    state = env.reset_np(seed=0, start=12, target=60)
    bv = _render(env, state)
    assert bv.shape == (320, 320, 7)
    # ego always stands on road
    assert bv[EGO_WINDOW_ROW - 2, EGO_WINDOW_COL, 0] == 1.0
    # road occupies a sane fraction of the view
    assert 0.05 < bv[..., 0].mean() < 0.9
    # some lane markings visible and they lie on road pixels
    lane = bv[..., 1] > 0
    assert lane.sum() > 20
    assert (bv[..., 0][lane]).mean() > 0.9


def test_bev_vehicle_ahead(env):
    state = env.reset_np(seed=0, start=12, target=60)
    fwd = np.array([np.cos(float(state.ego.yaw)),
                    np.sin(float(state.ego.yaw))])
    vpos = jnp.asarray(np.asarray(state.ego.pos) + 10.0 * fwd)[None]
    npc_pos = state.npc.pos.at[0].set(vpos[0])
    npc_yaw = state.npc.yaw.at[0].set(state.ego.yaw)
    npc_active = state.npc.active.at[0].set(True).at[1:].set(False)
    bv = _render(env, state, npc_pos=npc_pos, npc_yaw=npc_yaw,
                 npc_active=npc_active)
    row = int(EGO_WINDOW_ROW - 10 * PIXELS_PER_METER_RENDER)
    assert bv[row, EGO_WINDOW_COL, 5] == 1.0
    # box is about 4.7 m x 1.9 m -> 21 x 8.5 px at 4.5 px/m
    area = bv[..., 5].sum()
    assert 100 < area < 350
    # ego itself is NOT drawn in the vehicle channel (map_utils.py:926-929)
    assert bv[EGO_WINDOW_ROW, EGO_WINDOW_COL, 5] == 0.0


def test_bev_walker_right(env):
    state = env.reset_np(seed=0, start=12, target=60)
    yaw = float(state.ego.yaw)
    lat = np.array([-np.sin(yaw), np.cos(yaw)])
    wpos = np.asarray(state.ego.pos) + 5.0 * lat
    walker_pos = state.walkers.pos.at[0].set(jnp.asarray(wpos))
    walker_active = state.walkers.active.at[:].set(
        jnp.arange(state.walkers.pos.shape[0]) == 0)
    bv = _render(env, state, walker_pos=walker_pos,
                 walker_active=walker_active)
    col = int(EGO_WINDOW_COL + 5 * PIXELS_PER_METER_RENDER)
    assert bv[EGO_WINDOW_ROW, col, 6] == 1.0


def test_bev_light_channels(env):
    state = env.reset_np(seed=0, start=12, target=60)
    m = env.map_np
    # park the ego right next to light 0 so its circle is in view
    lpos = m.light_pole_pos[0]
    state = state._replace(ego=state.ego._replace(
        pos=jnp.asarray(lpos + np.array([0, -5], np.float32))))
    for st, ch in [(RED, 2), (GREEN, 4)]:
        ls = jnp.full(m.light_pole_pos.shape[0], st, jnp.int32)
        bv = _render(env, state, light_state=ls)
        assert bv[..., ch].sum() > 3    # circle of radius 1.5 m visible
        other = 2 if ch == 4 else 4
        assert bv[..., other].sum() == 0


def test_bev_vmap(env):
    from lbc_tpu.engine import stack_states
    states = [env.reset_np(seed=s, start=10 + s, target=50 + s)
              for s in range(3)]
    batch = stack_states(states)
    m = env.map_data
    ls = jnp.zeros((3, m.light_pole_pos.shape[0]), jnp.int32)
    fn = jax.vmap(lambda e_pos, e_yaw, np_, ny, na, wp, wa, l:
                  render_bev(m, e_pos, e_yaw, np_, ny, na, wp, wa,
                             m.light_pole_pos, l))
    bv = fn(batch.ego.pos, batch.ego.yaw, batch.npc.pos, batch.npc.yaw,
            batch.npc.active, batch.walkers.pos, batch.walkers.active, ls)
    assert bv.shape == (3, 320, 320, 7)
