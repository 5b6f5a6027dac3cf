"""Vehicle dynamics: kinematic bicycle with a fitted longitudinal model.

TPU-native stand-in for the CARLA/PhysX rigid-body step consumed via
apply_control + world.tick (carla_utils.py:554-602). Wheelbase 2.89 m per
the reference's recorded value (controller.py:72). The longitudinal
throttle/brake -> acceleration curve is chosen so the reference PID gains
(speed PID K_P=1.0 birdview / 0.8 image; expert K_P=1.0) produce stable
tracking of the 0-10 m/s speeds the benchmarks use; closed-loop behavior
is validated in tests/test_engine.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import DT, WHEELBASE


class DynamicsParams(NamedTuple):
    max_steer_rad: float = 1.22     # full-lock wheel angle
    accel_gain: float = 3.5         # m/s^2 at full throttle, zero speed
    accel_speed_falloff: float = 0.08  # engine force fades with speed
    drag: float = 0.0045            # quadratic drag coeff
    rolling: float = 0.25           # constant rolling resistance, m/s^2
    brake_decel: float = 8.0        # m/s^2 at full brake
    substeps: int = 2


DEFAULT_DYNAMICS = DynamicsParams()


def bicycle_step(pos, yaw, speed, steer, throttle, brake,
                 params: DynamicsParams = DEFAULT_DYNAMICS, dt: float = DT):
    """One fixed 0.1 s step (any batch shape).

    steer in [-1, 1] (positive = right in CARLA's x-east/y-south frame),
    throttle in [0, 1], brake in [0, 1]. Returns (pos, yaw, speed).
    """
    steer = jnp.clip(steer, -1.0, 1.0)
    throttle = jnp.clip(throttle, 0.0, 1.0)
    brake = jnp.clip(brake, 0.0, 1.0)

    h = dt / params.substeps
    delta = steer * params.max_steer_rad
    for _ in range(params.substeps):
        engine = throttle * params.accel_gain \
            / (1.0 + params.accel_speed_falloff * speed)
        resist = params.drag * speed * speed \
            + jnp.where(speed > 0.01, params.rolling, 0.0)
        acc = engine - resist - brake * params.brake_decel
        new_speed = jnp.maximum(speed + acc * h, 0.0)   # no reverse gear
        avg_speed = 0.5 * (speed + new_speed)
        yaw_rate = avg_speed / WHEELBASE * jnp.tan(delta)
        new_yaw = yaw + yaw_rate * h
        mid_yaw = yaw + 0.5 * yaw_rate * h
        fwd = jnp.stack([jnp.cos(mid_yaw), jnp.sin(mid_yaw)], axis=-1)
        pos = pos + fwd * (avg_speed * h)[..., None]
        yaw, speed = new_yaw, new_speed
    yaw = jnp.arctan2(jnp.sin(yaw), jnp.cos(yaw))
    return pos, yaw, speed
