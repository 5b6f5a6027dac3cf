"""Cross-chip env-rollout sharding (SURVEY.md section 2.2 env-parallelism):
the same fused rollout runs under shard_map with the env batch split over
the mesh 'data' axis, bit-identical to the single-device path. Runs on the
8-device virtual CPU mesh (conftest.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from lbc_tpu.agents import expert_init, expert_step
from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
from lbc_tpu.engine.rollout import make_rollout
from lbc_tpu.parallel import make_mesh, shard_batch

N = 8
STEPS = 25


def _expert(map_data, env_state, obs, agent):
    return expert_step(map_data, env_state, agent)


def _make_batch(env):
    protos = [env.reset_np(seed=s, start=11 * s + 7, target=11 * s + 60)
              for s in range(N)]
    batch = stack_states(protos)
    agent0 = jax.tree.map(lambda x: jnp.stack([x] * N), expert_init())
    return batch, agent0


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sharded_rollout_bitexact():
    env = DrivingEnv(EnvConfig(town='Town01', n_vehicles=4,
                               n_pedestrians=4))
    batch, agent0 = _make_batch(env)

    single = make_rollout(env, _expert, STEPS)
    e1, a1, m1, _ = single(batch, agent0)

    mesh = make_mesh(N)
    sharded = make_rollout(env, _expert, STEPS, mesh=mesh)
    e2, a2, m2, _ = sharded(shard_batch(mesh, batch),
                            shard_batch(mesh, agent0))

    # envs must actually be split across all 8 devices
    assert len(e2.ego.pos.sharding.device_set) == N
    _assert_trees_equal(m1, m2)
    _assert_trees_equal(e1, e2)
    _assert_trees_equal(a1, a2)


def test_sharded_rollout_collect_time_axis():
    """Collected trajectories stack time at axis 0, batch sharded at
    axis 1."""
    env = DrivingEnv(EnvConfig(town='Town01'))
    batch, agent0 = _make_batch(env)

    def collect(env_state, obs, control, aux):
        return {'speed': obs['speed'], 'control': control}

    single = make_rollout(env, _expert, STEPS, collect=collect)
    _, _, _, rec1 = single(batch, agent0)

    mesh = make_mesh(N)
    sharded = make_rollout(env, _expert, STEPS, collect=collect, mesh=mesh)
    _, _, _, rec2 = sharded(shard_batch(mesh, batch),
                            shard_batch(mesh, agent0))

    assert rec2['speed'].shape == (STEPS, N)
    _assert_trees_equal(rec1, rec2)


def test_sharded_rollout_batched_agent():
    """batched_agent=True (the Pallas/conv-net path shape) under the mesh:
    the agent sees the per-shard batch."""
    env = DrivingEnv(EnvConfig(town='Town01'))
    batch, agent0 = _make_batch(env)

    def agent(map_data, env_states, obs, agent_states):
        b = obs['speed'].shape[0]
        control = jnp.tile(jnp.array([[0.0, 0.5, 0.0]]), (b, 1))
        return control, agent_states, None

    single = make_rollout(env, agent, STEPS, batched_agent=True)
    e1, _, m1, _ = single(batch, agent0)

    mesh = make_mesh(N)
    sharded = make_rollout(env, agent, STEPS, batched_agent=True,
                           mesh=mesh)
    e2, _, m2, _ = sharded(shard_batch(mesh, batch),
                           shard_batch(mesh, agent0))
    _assert_trees_equal(m1, m2)
    _assert_trees_equal(e1, e2)


def test_init_distributed_single_host_noop(monkeypatch):
    """Without coordinates, init_distributed is a no-op returning False
    (single-host); with an explicit address it would call
    jax.distributed.initialize (stubbed here — no second host exists)."""
    import lbc_tpu.parallel as par
    for var in ('JAX_COORDINATOR_ADDRESS', 'COORDINATOR_ADDRESS',
                'TPU_WORKER_HOSTNAMES', 'MEGASCALE_COORDINATOR_ADDRESS'):
        monkeypatch.delenv(var, raising=False)
    assert par.init_distributed() is False

    called = {}
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda **kw: called.update(kw))
    assert par.init_distributed('10.0.0.1:1234', 2, 0) is True
    assert called == {'coordinator_address': '10.0.0.1:1234',
                      'num_processes': 2, 'process_id': 0}
