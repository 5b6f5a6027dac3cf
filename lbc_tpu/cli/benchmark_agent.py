"""Evaluate an agent on benchmark suites.

Capability parity with /root/reference/benchmark_agent.py: reconstructs the
model from config.json next to the checkpoint (the save_config contract,
benchmark_agent.py:27-48), maps model names to (model, agent) pairs
('birdview_dian' -> privileged, 'image_ss' -> image), supports the
autopilot expert via --autopilot, and loops over suite aliases.

Usage:
  python -m lbc_tpu.cli.benchmark_agent --suite=town1 --autopilot
  python -m lbc_tpu.cli.benchmark_agent --suite=NoCrashTown01-v1 \
      --model-path ckpts/privileged/model-256 --seed 0
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from ..agents import expert_init, expert_step
from ..bench import format_table, collect_results, get_suites, make_suite, \
    run_benchmark
from ..utils.experiment import load_config


def expert_factory(env):
    def step(m, s, obs, a):
        c, a2, h = expert_step(m, s, a)
        return c, a2, h

    def init(b):
        return jax.tree.map(lambda x: jnp.stack([x] * b), expert_init())
    return step, init


def model_agent_factory(model_path: str):
    """Rebuild (model, variables, agent wiring) from config.json."""
    from ..models import get_model
    from ..train.checkpoints import load_checkpoint
    from ..train.birdview_trainer import init_birdview_training
    from ..train.image_trainer import init_image_training

    config = load_config(model_path)
    name = config['model_args']['model']
    backbone = config['model_args'].get('backbone', 'resnet18')

    if name in ('birdview_dian', 'birdview'):
        from ..agents import make_privileged_agent, privileged_init
        from ..agents.privileged import make_privileged_agent_batched
        from ..train.birdview_trainer import make_birdview_model
        model = make_birdview_model(backbone=backbone)
        template, _ = init_birdview_training(jax.random.PRNGKey(0), model)
        state = load_checkpoint(model_path, template)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        if jax.default_backend() == 'tpu':
            # fused Pallas 192-crop render + full-batch conv net
            step_fn = make_privileged_agent_batched(model, variables)
            step_fn.batched = True
        else:
            step_fn = make_privileged_agent(model, variables)
        init_one = privileged_init
    elif name in ('image_ss', 'image'):
        from ..agents.image import (image_agent_init, make_image_agent,
                                    make_image_agent_batched)
        from ..train.image_trainer import make_image_model
        model = make_image_model(backbone=backbone, all_branch=False)
        template, _ = init_image_training(jax.random.PRNGKey(0), model)
        state = load_checkpoint(model_path, template)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        if jax.default_backend() == 'tpu':
            # fused Pallas camera render + full-batch conv net
            step_fn = make_image_agent_batched(model, variables)
            step_fn.batched = True
        else:
            step_fn = make_image_agent(model, variables)
        init_one = image_agent_init
    else:
        raise ValueError(f'unknown model in config: {name}')

    def factory(env):
        def init(b):
            return jax.tree.map(lambda x: jnp.stack([x] * b), init_one())
        return step_fn, init
    return factory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--suite', default='town1')
    ap.add_argument('--model-path', default=None)
    ap.add_argument('--autopilot', action='store_true')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--log-dir', default='benchmark_results')
    ap.add_argument('--batch-size', type=int, default=64)
    ap.add_argument('--max-ticks', type=int, default=None)
    ap.add_argument('--no-resume', action='store_true')
    ap.add_argument('--videos', type=int, default=0,
                    help='record BEV+HUD videos of the first N runs per '
                         'suite (run_benchmark.py:236 analog)')
    ap.add_argument('--diagnostics', action='store_true',
                    help='write per-tick diagnostics CSVs per episode '
                         '(x, y, speed, ran_light...; '
                         'run_benchmark.py:234,244 analog)')
    args = ap.parse_args()

    assert args.autopilot or args.model_path, \
        'need --autopilot or --model-path'
    factory = expert_factory if args.autopilot \
        else model_agent_factory(args.model_path)
    tag = 'autopilot' if args.autopilot else Path(args.model_path).stem

    for suite_name in get_suites(args.suite):
        suite = make_suite(suite_name)
        out = Path(args.log_dir) / f'{tag}_seed{args.seed}' / suite_name
        df = run_benchmark(factory, suite, out, seed=args.seed,
                           resume=not args.no_resume,
                           batch_size=args.batch_size,
                           max_ticks=args.max_ticks,
                           diagnostics=args.diagnostics,
                           n_videos=args.videos)
        print(f'{suite_name}: {100 * df["success"].mean():.1f}% '
              f'({int(df["success"].sum())}/{len(df)})')

    print(format_table(collect_results(args.log_dir)))


if __name__ == '__main__':
    main()
