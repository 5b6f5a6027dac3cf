#!/usr/bin/env python
"""Random-search PID tuning on the batched engine.

Capability parity with /root/reference/bird_view/scripts/tune_pid.py
(random K_P/K_I/K_D over short rollouts, plotting desired-vs-actual) —
TPU-first: every candidate gain set is a *batch lane*, so hundreds of
candidates evaluate in one vmapped rollout instead of sequential 125-tick
episodes.

Usage: python tools/tune_pid.py [--candidates 64] [--ticks 150]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# host-side tuning tool: the virtual CPU backend compiles much faster than
# the tunneled TPU for this tiny program
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--candidates', type=int, default=64)
    ap.add_argument('--ticks', type=int, default=150)
    ap.add_argument('--target-speed', type=float, default=6.0)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    from lbc_tpu.control import pid_init, pid_step
    from lbc_tpu.engine import bicycle_step

    rng = np.random.RandomState(args.seed)
    kp = rng.uniform(0.2, 2.0, args.candidates)
    ki = rng.uniform(0.0, 0.5, args.candidates)
    kd = rng.uniform(0.0, 3.0, args.candidates)

    @jax.jit
    def evaluate(kp, ki, kd):
        def body(carry, _):
            pos, yaw, speed, st = carry
            st, out = pid_step(st, args.target_speed - speed, kp, ki, kd)
            throttle = jnp.clip(out, 0.0, 1.0)
            pos, yaw, speed = bicycle_step(pos, yaw, speed,
                                           jnp.zeros_like(speed),
                                           throttle,
                                           jnp.zeros_like(speed))
            return (pos, yaw, speed, st), speed

        n = kp.shape[0]
        init = (jnp.zeros((n, 2)), jnp.zeros(n), jnp.zeros(n),
                pid_init(30, (n,)))
        _, speeds = jax.lax.scan(body, init, None, length=args.ticks)
        err = jnp.abs(speeds - args.target_speed)
        # settle error over the last third + overshoot penalty
        tail = err[-args.ticks // 3:]
        overshoot = jnp.maximum(speeds - args.target_speed, 0.0).max(0)
        return tail.mean(0) + 0.5 * overshoot

    scores = np.asarray(evaluate(jnp.asarray(kp), jnp.asarray(ki),
                                 jnp.asarray(kd)))
    order = np.argsort(scores)
    print(f'{"rank":>4} {"score":>8} {"K_P":>6} {"K_I":>6} {"K_D":>6}')
    for r, i in enumerate(order[:10]):
        print(f'{r:>4} {scores[i]:8.4f} {kp[i]:6.3f} {ki[i]:6.3f} '
              f'{kd[i]:6.3f}')


if __name__ == '__main__':
    main()
