"""Pallas BEV kernel vs the XLA reference implementation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.engine import DrivingEnv, EnvConfig
from lbc_tpu.engine.lights import RED
from lbc_tpu.ops import render_bev_pallas
from lbc_tpu.render import render_bev


@pytest.fixture(scope='module')
def env():
    return DrivingEnv(EnvConfig(town='Town01', n_vehicles=6,
                                n_pedestrians=8))


def test_pallas_matches_xla(env):
    m = env.map_data
    states = [env.reset_np(seed=s, start=20 + 30 * s, target=90 + s)
              for s in range(2)]
    from lbc_tpu.engine import stack_states
    batch = stack_states(states)
    ls = jnp.full((2, m.light_pole_pos.shape[0]), RED, jnp.int32)

    ref = jax.vmap(lambda p, y, np_, ny, na, wp, wa, l: render_bev(
        m, p, y, np_, ny, na, wp, wa, m.light_pole_pos, l))(
        batch.ego.pos, batch.ego.yaw, batch.npc.pos, batch.npc.yaw,
        batch.npc.active, batch.walkers.pos, batch.walkers.active, ls)

    out = render_bev_pallas(
        m, batch.ego.pos, batch.ego.yaw, batch.npc.pos, batch.npc.yaw,
        batch.npc.active, batch.walkers.pos, batch.walkers.active,
        ls, interpret=True)

    assert out.shape == (2, 320, 320, 7)
    ref_np = np.asarray(ref)
    out_np = np.asarray(out)
    agree = (ref_np == out_np).mean()
    assert agree > 0.999, f'agreement {agree}'


def test_crop_render_bitexact(env):
    """render_bev_crop_pallas == crop_birdview(render_bev_pallas) — the
    agent hot path renders only the 192x192 crop."""
    from lbc_tpu.constants import AGENT_CROP_DX
    from lbc_tpu.engine import stack_states
    from lbc_tpu.models import crop_birdview
    from lbc_tpu.ops import render_bev_crop_pallas

    m = env.map_data
    states = [env.reset_np(seed=s, start=20 + 30 * s, target=90 + s)
              for s in range(2)]
    batch = stack_states(states)
    ls = jnp.full((2, m.light_pole_pos.shape[0]), RED, jnp.int32)

    full = render_bev_pallas(
        m, batch.ego.pos, batch.ego.yaw, batch.npc.pos, batch.npc.yaw,
        batch.npc.active, batch.walkers.pos, batch.walkers.active,
        ls, interpret=True)
    ref = crop_birdview(full, dx=AGENT_CROP_DX)

    out = render_bev_crop_pallas(
        m, batch.ego.pos, batch.ego.yaw, batch.npc.pos, batch.npc.yaw,
        batch.npc.active, batch.walkers.pos, batch.walkers.active,
        ls, dx=AGENT_CROP_DX, interpret=True)

    assert out.shape == (2, 192, 192, 7)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
