"""Legacy VehiclePIDController (reference:
PythonAPI/agents/navigation/controller.py:20-189).

The upstream CARLA client controller pairs a longitudinal PID on speed
error (30-deep window) with a lateral PID on the signed heading-to-
waypoint angle (10-deep window); the legacy LocalPlanner drives it
per-frame on the host. Here both live inside the jitted env step as
fixed-shape ring buffers (control/pid.py), batched over envs.

The upstream output formula is
    clip(K_P*e + K_D*(de/dt)/dt + K_I*(sum(e)*dt)*dt, lo, hi)
— note the derivative's second /dt and the integral's second *dt
(controller.py:118-123, 180-189). That is exactly `pid_step` with
effective gains (kp, ki*dt, kd/dt), so the quirk is preserved via gain
rescaling rather than a parallel formula.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .pid import PIDState, pid_init, pid_step

LON_WINDOW = 30   # controller.py:90 deque(maxlen=30)
LAT_WINDOW = 10   # controller.py:143 deque(maxlen=10)


class LegacyPIDParams(NamedTuple):
    """Gains for both axes (controller.py defaults: all-P 1.0)."""
    lat_kp: float = 1.0
    lat_ki: float = 0.0
    lat_kd: float = 0.0
    lon_kp: float = 1.0
    lon_ki: float = 0.0
    lon_kd: float = 0.0
    dt: float = 0.1


class LegacyControllerState(NamedTuple):
    lon: PIDState
    lat: PIDState


def legacy_controller_init(batch_shape=()) -> LegacyControllerState:
    return LegacyControllerState(lon=pid_init(LON_WINDOW, batch_shape),
                                 lat=pid_init(LAT_WINDOW, batch_shape))


def heading_to_waypoint_angle(pos, yaw, waypoint):
    """Signed angle from the heading vector to the waypoint direction,
    positive when the waypoint is to the left-hand (+cross) side —
    the acos+cross-sign construction of controller.py:156-176."""
    to_wp = waypoint - pos
    hx, hy = jnp.cos(yaw), jnp.sin(yaw)
    dot = to_wp[..., 0] * hx + to_wp[..., 1] * hy
    cross = hx * to_wp[..., 1] - hy * to_wp[..., 0]
    norm = jnp.maximum(jnp.linalg.norm(to_wp, axis=-1), 1e-6)
    mag = jnp.arccos(jnp.clip(dot / norm, -1.0, 1.0))
    return jnp.where(cross < 0, -mag, mag)


def vehicle_pid_step(state: LegacyControllerState, pos, yaw, speed,
                     target_speed, waypoint,
                     params: LegacyPIDParams = LegacyPIDParams()):
    """One VehiclePIDController.run_step: (state', steer, throttle).

    Speed units cancel in the error so m/s works directly (upstream
    feeds km/h); brake is never commanded, as upstream (:60-67).
    """
    dt = params.dt
    lon, throttle = pid_step(state.lon, target_speed - speed,
                             params.lon_kp, params.lon_ki * dt,
                             params.lon_kd / dt, dt)
    alpha = heading_to_waypoint_angle(pos, yaw, waypoint)
    lat, steer = pid_step(state.lat, alpha,
                          params.lat_kp, params.lat_ki * dt,
                          params.lat_kd / dt, dt)
    return (LegacyControllerState(lon=lon, lat=lat),
            jnp.clip(steer, -1.0, 1.0), jnp.clip(throttle, 0.0, 1.0))
