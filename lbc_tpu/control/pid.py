"""Functional PID controllers with fixed-size error windows.

Capability parity with PIDController / CustomController
(/root/reference/bird_view/models/controller.py:43-99): a deque of the last
`n` errors, integral = sum(window) * dt, derivative = (e[t] - e[t-1]) / dt,
both zero until two errors have been seen.

TPU-first design: the deque becomes a fixed-shape ring buffer carried in a
pytree, so the controller lives *inside* the jitted, vmapped env step (the
reference runs it per-frame on the host). All ops are masked vector math —
no data-dependent shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PIDState(NamedTuple):
    buffer: jnp.ndarray  # (..., n) ring of recent errors
    count: jnp.ndarray   # (...,) int32 number of errors pushed so far


def pid_init(n: int, batch_shape=(), dtype=jnp.float32) -> PIDState:
    return PIDState(
        buffer=jnp.zeros(batch_shape + (n,), dtype),
        count=jnp.zeros(batch_shape, jnp.int32),
    )


def pid_reset(state: PIDState) -> PIDState:
    return PIDState(jnp.zeros_like(state.buffer),
                    jnp.zeros_like(state.count))


def _push(buffer, count, error):
    n = buffer.shape[-1]
    pos = (count % n)[..., None]
    idx = jnp.arange(n)
    buffer = jnp.where(idx == pos, error[..., None], buffer)
    return buffer, count + 1


def pid_step(state: PIDState, error, kp, ki, kd, dt=0.1):
    """Push error, return (new_state, control).

    kp/ki/kd may be scalars or batched (e.g. per-env per-command gains).
    """
    error = jnp.asarray(error, state.buffer.dtype)
    buffer, count = _push(state.buffer, state.count, error)
    n = buffer.shape[-1]

    n_valid = jnp.minimum(count, n)
    idx = jnp.arange(n)
    # Valid entries are the last n_valid pushes; with the ring layout every
    # slot < n_valid-or-wrapped is valid: once count >= n all are valid,
    # before that slots [0, count) are valid.
    valid = idx < n_valid[..., None]
    integral = jnp.sum(jnp.where(valid, buffer, 0.0), axis=-1) * dt

    prev_pos = (count - 2) % n          # count already incremented
    prev = jnp.take_along_axis(buffer, prev_pos[..., None], axis=-1)[..., 0]
    derivative = (error - prev) / dt

    have_two = count >= 2
    integral = jnp.where(have_two, integral, 0.0)
    derivative = jnp.where(have_two, derivative, 0.0)

    control = kp * error + ki * integral + kd * derivative
    return PIDState(buffer, count), control


# Per-command PID gain tables (CustomController pattern,
# birdview.py:92-97 / image.py:108-113 / controller.py:71-99).
class CommandPIDParams(NamedTuple):
    kp: jnp.ndarray  # (4,) indexed by command-1
    ki: jnp.ndarray
    kd: jnp.ndarray


def command_pid_step(state: PIDState, alpha, command, params: CommandPIDParams,
                     dt=0.1):
    """CustomController.run_step: per-command PID on heading error alpha.

    `command` is int in {1..4} (batched). Window n=10 per controller.py:82.
    """
    cmd_idx = jnp.clip(command - 1, 0, 3)
    kp = params.kp[cmd_idx]
    ki = params.ki[cmd_idx]
    kd = params.kd[cmd_idx]
    return pid_step(state, alpha, kp, ki, kd, dt)
