"""Waypoints -> (steer, throttle, brake), fully batched and jit-safe.

Capability parity with the decode recipes of BirdViewAgent.run_step
(/root/reference/bird_view/models/birdview.py:104-174) and
ImageAgent.run_step (/root/reference/bird_view/models/image.py:124-219):
circle fit through the predicted waypoints, project a per-command steer
point onto the circle, heading-error PID for steer, speed PID for throttle,
brake rules. Runs inside the jitted rollout (the reference runs it on host
per frame, one env at a time).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import (CAMERA_FIXED_OFFSET, CAMERA_FOV, CAMERA_HEIGHT,
                         CAMERA_WIDTH, CAMERA_Z, CROP_SIZE, DT, GAP,
                         PIXELS_PER_METER, SPEED_STEPS, STEPS)
from .circle_fit import ls_circle, project_point_to_circle
from .pid import CommandPIDParams, PIDState, command_pid_step, pid_init, \
    pid_step


class ControllerState(NamedTuple):
    speed_pid: PIDState   # window 30 (controller.py:44)
    turn_pid: PIDState    # window 10 (controller.py:82)


def controller_init(batch_shape=()) -> ControllerState:
    return ControllerState(pid_init(30, batch_shape), pid_init(10, batch_shape))


class AgentControllerParams(NamedTuple):
    steer_points: jnp.ndarray      # (4,) int, indexed by command-1
    turn_pid: CommandPIDParams     # per-command steering gains
    speed_kp: float
    speed_ki: float
    speed_kd: float
    engine_brake_threshold: float  # below: zero steer/throttle
    brake_threshold: float         # below: full brake


def birdview_controller_params() -> AgentControllerParams:
    """Gains from birdview.py:86-97."""
    return AgentControllerParams(
        steer_points=jnp.array([3, 2, 2, 2], jnp.int32),
        turn_pid=CommandPIDParams(
            kp=jnp.array([1.0, 1.0, 0.8, 0.8]),
            ki=jnp.array([0.1, 0.1, 0.1, 0.1]),
            kd=jnp.array([0.0, 0.0, 0.0, 0.0])),
        speed_kp=1.0, speed_ki=0.1, speed_kd=2.5,
        engine_brake_threshold=1.0, brake_threshold=1.0)


def image_controller_params() -> AgentControllerParams:
    """Gains from image.py:104-120."""
    return AgentControllerParams(
        steer_points=jnp.array([4, 3, 2, 2], jnp.int32),
        turn_pid=CommandPIDParams(
            kp=jnp.array([0.5, 0.7, 1.0, 1.0]),
            ki=jnp.array([0.20, 0.10, 0.10, 0.50]),
            kd=jnp.array([0.0, 0.0, 0.0, 0.0])),
        speed_kp=0.8, speed_ki=0.08, speed_kd=0.0,
        engine_brake_threshold=2.0, brake_threshold=2.0)


def birdview_locations_to_targets(locations):
    """[-1,1]^2 crop-space waypoints (..., 5, 2) -> ego-frame meters
    (forward, lateral) (..., 5, 2). Mirrors birdview.py:122-134."""
    px = (locations + 1.0) / 2.0 * CROP_SIZE
    dx = px[..., 0] - CROP_SIZE / 2.0        # lateral px
    dy = CROP_SIZE - px[..., 1]              # forward px
    return jnp.stack([dy, dx], axis=-1) / PIXELS_PER_METER


def birdview_target_speed(locations):
    """Mean step length of the first SPEED_STEPS waypoints in px
    (birdview.py:136-146)."""
    px = (locations + 1.0) / 2.0 * CROP_SIZE
    deltas = px[..., 1:SPEED_STEPS, :] - px[..., 0:SPEED_STEPS - 1, :]
    step_px = jnp.linalg.norm(deltas, axis=-1)
    return jnp.sum(step_px, axis=-1) / (PIXELS_PER_METER * GAP * DT) \
        / (SPEED_STEPS - 1)


def unproject_image_waypoints(locations, world_y=CAMERA_Z,
                              fov=CAMERA_FOV,
                              fixed_offset=CAMERA_FIXED_OFFSET):
    """[-1,1]^2 image-space waypoints -> ego-frame (forward, lateral) meters.

    Pinhole ground-plane inverse from image.py:198-219. yt is clamped
    positive so a (pathological) above-horizon prediction yields a far
    point instead of a sign flip.
    """
    size = jnp.array([CAMERA_WIDTH, CAMERA_HEIGHT], jnp.float32)
    px = (locations + 1.0) * size / 2.0
    cx, cy = CAMERA_WIDTH / 2.0, CAMERA_HEIGHT / 2.0
    f = CAMERA_WIDTH / (2.0 * jnp.tan(fov * jnp.pi / 360.0))
    xt = (px[..., 0] - cx) / f
    yt = jnp.maximum((px[..., 1] - cy) / f, 1e-4)
    world_z = world_y / yt
    world_x = world_z * xt
    forward = world_z - fixed_offset
    return jnp.stack([forward, world_x], axis=-1)


def image_target_speed(targets_with_origin):
    """Mean consecutive distance / (gap*dt) over 6 points incl. origin
    (image.py:159)."""
    d = targets_with_origin[..., 1:, :] - targets_with_origin[..., :-1, :]
    return jnp.mean(jnp.linalg.norm(d, axis=-1), axis=-1) / (GAP * DT)


def _steer_from_targets(targets, command, params: AgentControllerParams,
                        turn_state: PIDState):
    """Circle fit + steer-point projection + per-command PID
    (birdview.py:148-157 / image.py:161-171)."""
    center, radius = ls_circle(targets)
    n = params.steer_points[jnp.clip(command - 1, 0, 3)]
    point = jnp.take_along_axis(
        targets, n[..., None, None].astype(jnp.int32).repeat(2, axis=-1),
        axis=-2)[..., 0, :]
    closest = project_point_to_circle(point, center, radius)
    alpha = jnp.arctan2(closest[..., 1], closest[..., 0])
    turn_state, steer = command_pid_step(turn_state, alpha, command,
                                         params.turn_pid)
    return turn_state, steer, alpha


def waypoints_to_control(targets_ego, target_speed, speed, command,
                         state: ControllerState,
                         params: AgentControllerParams):
    """Shared tail of both agents.

    targets_ego: (..., 5, 2) ego-frame (forward, lateral) meters.
    Returns (control (..., 3) [steer, throttle, brake], new_state).
    """
    origin = jnp.zeros_like(targets_ego[..., :1, :])
    targets = jnp.concatenate([origin, targets_ego], axis=-2)   # (..., 6, 2)

    turn_state, steer, _ = _steer_from_targets(
        targets, command, params, state.turn_pid)
    speed_state, throttle = pid_step(
        state.speed_pid, target_speed - speed,
        params.speed_kp, params.speed_ki, params.speed_kd)

    slow = target_speed <= params.engine_brake_threshold
    stop = target_speed <= params.brake_threshold
    steer = jnp.where(slow, 0.0, steer)
    throttle = jnp.where(slow, 0.0, throttle)
    brake = jnp.where(stop, 1.0, 0.0)

    control = jnp.stack([
        jnp.clip(steer, -1.0, 1.0),
        jnp.clip(throttle, 0.0, 1.0),
        jnp.clip(brake, 0.0, 1.0),
    ], axis=-1)
    return control, ControllerState(speed_state, turn_state)


def birdview_agent_control(locations, speed, command, state, params=None):
    """Full BirdViewAgent decode: net output -> control.

    Brake rule per birdview.py:161-164 (strict `target_speed < 1.0`):
    engine_brake_threshold == brake_threshold == 1.0 reproduces it.
    """
    params = params or birdview_controller_params()
    targets = birdview_locations_to_targets(locations)
    tspeed = birdview_target_speed(locations)
    return waypoints_to_control(targets, tspeed, speed, command, state, params)


def image_agent_control(locations, speed, command, state, params=None):
    """Full ImageAgent decode (image.py:124-196)."""
    params = params or image_controller_params()
    targets = unproject_image_waypoints(locations)
    origin = jnp.zeros_like(targets[..., :1, :])
    tspeed = image_target_speed(jnp.concatenate([origin, targets], axis=-2))
    return waypoints_to_control(targets, tspeed, speed, command, state, params)
