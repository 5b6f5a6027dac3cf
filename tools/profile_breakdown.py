#!/usr/bin/env python
"""Hot-loop profile breakdown: env vs render vs net (RESULTS.md table).

Times three rollout variants at the same batch so the stage costs
separate by subtraction:
  env      — expert agent (world step + routing + hazards + PID only)
  render   — env + fused Pallas 192-crop BEV render (net replaced by a
             constant waypoint pattern)
  full     — env + render + conv net + controller (bench.py default)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timed(rollout, args_, n=2):
    import jax
    out = rollout(*args_)
    jax.block_until_ready(out[2])
    best = float('inf')
    for _ in range(n):
        t0 = time.time()
        out = rollout(*args_)
        jax.block_until_ready(out[2])
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1024)
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--env-substages', action='store_true',
                    help='also isolate walker vs NPC cost inside the env '
                         'step by timing expert rollouts with the walker/'
                         'vehicle sets shrunk to 1 lane (static shapes -> '
                         'XLA drops the compute); 2 extra compiles')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lbc_tpu.agents import expert_init, expert_step
    from lbc_tpu.agents.privileged import (make_privileged_agent_batched,
                                           privileged_init)
    from lbc_tpu.constants import AGENT_CROP_DX
    from lbc_tpu.engine import DrivingEnv, EnvConfig, stack_states
    from lbc_tpu.engine.lights import light_states_md
    from lbc_tpu.engine.rollout import make_rollout
    from lbc_tpu.models import BirdviewPolicy
    from lbc_tpu.ops import render_bev_crop_pallas

    env = DrivingEnv(EnvConfig(town='Town01', n_vehicles=20,
                               n_pedestrians=50))
    protos = [env.reset_np(seed=s, start=11 * s + 7, target=11 * s + 60)
              for s in range(8)]
    batch = stack_states(protos)
    reps = -(-args.batch // 8)
    batch = jax.tree.map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:args.batch],
        batch)
    B, S = args.batch, args.steps

    # --- env only (expert) ---
    def exp_step(m, s, obs, a):
        return expert_step(m, s, a)
    a0 = jax.tree.map(lambda x: jnp.stack([x] * B), expert_init())
    t_env = timed(make_rollout(env, exp_step, S), (batch, a0))

    # --- env substages: walker / NPC isolation by shape shrinking ---
    if args.env_substages:
        def env_time(n_veh, n_ped):
            e = DrivingEnv(EnvConfig(town='Town01', n_vehicles=n_veh,
                                     n_pedestrians=n_ped))
            ps = [e.reset_np(seed=s, start=11 * s + 7, target=11 * s + 60)
                  for s in range(8)]
            b = stack_states(ps)
            b = jax.tree.map(
                lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:B], b)
            return timed(make_rollout(e, exp_step, S), (b, a0))

        t_noped = env_time(20, 0)   # max_walkers clamps to 1: ~1/50 cost
        t_noveh = env_time(0, 50)
        print(f'env w/o walkers: {t_noped:.3f}s '
              f'(walkers ~{1e6 * (t_env - t_noped) / (B * S):.2f} '
              f'us/env-step)')
        print(f'env w/o NPCs   : {t_noveh:.3f}s '
              f'(NPCs ~{1e6 * (t_env - t_noveh) / (B * S):.2f} us/env-step)')

    # --- env + render (no net) ---
    def render_step(map_data, env_states, obs, agent_states):
        lstate = jax.vmap(lambda t0, t: light_states_md(
            map_data, t0, t))(
                env_states.episode.light_t0, env_states.episode.tick)
        crop = render_bev_crop_pallas(
            map_data, env_states.ego.pos, env_states.ego.yaw,
            env_states.npc.pos, env_states.npc.yaw, env_states.npc.active,
            env_states.walkers.pos, env_states.walkers.active, lstate,
            dx=AGENT_CROP_DX)
        # consume the render so XLA cannot DCE it; constant throttle
        bias = jnp.mean(crop, axis=(1, 2, 3), keepdims=False) * 1e-6
        ctrl = jnp.stack([jnp.zeros(B) + bias, jnp.full((B,), 0.5),
                          jnp.zeros(B)], axis=-1)
        return ctrl, agent_states, None
    ar = jax.tree.map(lambda x: jnp.stack([x] * B), privileged_init())
    t_render = timed(make_rollout(env, render_step, S,
                                  batched_agent=True), (batch, ar))

    # --- full privileged ---
    model = BirdviewPolicy(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 192, 192, 7)), jnp.zeros((1,)),
                           jnp.zeros((1, 4)))
    full_step = make_privileged_agent_batched(model, variables)
    t_full = timed(make_rollout(env, full_step, S, batched_agent=True),
                   (batch, ar))

    n = B * S
    print(f'batch={B} steps={S} device={jax.devices()[0].device_kind}')
    print(f'env-only   : {t_env:.3f}s  {n / t_env:,.0f} steps/s')
    print(f'env+render : {t_render:.3f}s  {n / t_render:,.0f} steps/s '
          f'(render ~{1e6 * (t_render - t_env) / n:.2f} us/env-step)')
    print(f'full       : {t_full:.3f}s  {n / t_full:,.0f} steps/s '
          f'(net+ctrl ~{1e6 * (t_full - t_render) / n:.2f} us/env-step)')


if __name__ == '__main__':
    main()
