from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from lbc_tpu.control import (birdview_agent_control, controller_init,
                             ls_circle, pid_init, pid_step,
                             project_point_to_circle)


def _pid_reference(errors, kp, ki, kd, n=30, dt=0.1):
    """Independent numpy re-statement of the windowed PID formula
    (controller.py:43-68) used as a golden model."""
    window = deque(maxlen=n)
    outs = []
    for e in errors:
        window.append(e)
        if len(window) >= 2:
            integral = sum(window) * dt
            derivative = (window[-1] - window[-2]) / dt
        else:
            integral = derivative = 0.0
        outs.append(kp * e + ki * integral + kd * derivative)
    return np.array(outs)


def test_pid_matches_windowed_reference():
    rng = np.random.RandomState(0)
    errors = rng.randn(100).astype(np.float32)
    kp, ki, kd, n = 1.0, 0.1, 2.5, 30

    state = pid_init(n)
    outs = []
    for e in errors:
        state, out = pid_step(state, e, kp, ki, kd)
        outs.append(float(out))
    expected = _pid_reference(errors, kp, ki, kd, n=n)
    np.testing.assert_allclose(outs, expected, rtol=1e-4, atol=1e-4)


def test_pid_batched():
    errors = np.array([[1.0, -1.0]] * 5, np.float32)
    state = pid_init(10, batch_shape=(2,))
    for e in errors:
        state, out = pid_step(state, jnp.asarray(e), 1.0, 0.0, 0.0)
    np.testing.assert_allclose(out, [1.0, -1.0], atol=1e-6)


def test_ls_circle_exact():
    theta = np.linspace(0.1, 2.0, 8)
    pts = np.stack([3.0 + 2.0 * np.cos(theta), -1.0 + 2.0 * np.sin(theta)], 1)
    center, r = ls_circle(jnp.asarray(pts))
    np.testing.assert_allclose(center, [3.0, -1.0], atol=1e-3)
    np.testing.assert_allclose(r, 2.0, atol=1e-3)


def test_ls_circle_collinear_no_nan():
    pts = np.stack([np.linspace(0, 10, 6), np.zeros(6)], 1)
    center, r = ls_circle(jnp.asarray(pts))
    assert np.all(np.isfinite(np.asarray(center)))
    assert np.isfinite(float(r))
    # projecting a forward point onto the huge circle keeps it near the line
    proj = project_point_to_circle(jnp.asarray(pts[3]), center, r)
    assert abs(float(proj[1])) < 1.0


def _straight_locations(speed_mps):
    """Locations in [-1,1] crop space for waypoints straight ahead with
    spacing speed*gap*dt meters (ego at crop bottom-center, 5 px/m)."""
    gap_m = speed_mps * 5 * 0.1
    locs = []
    for i in range(1, 6):
        fwd_px = i * gap_m * 5
        col = 96.0
        row = 192.0 - fwd_px
        locs.append([col / 96.0 - 1.0, row / 96.0 - 1.0])
    return np.array(locs, np.float32)


def test_birdview_decode_straight():
    locs = jnp.asarray(_straight_locations(5.0))
    state = controller_init()
    control, state = birdview_agent_control(
        locs, jnp.asarray(2.0), jnp.asarray(4), state)
    steer, throttle, brake = np.asarray(control)
    assert abs(steer) < 1e-3
    assert throttle > 0.5        # target 5 m/s, current 2 m/s
    assert brake == 0.0


def test_birdview_decode_brake_when_slow():
    locs = jnp.asarray(_straight_locations(0.5))   # target speed 0.5 < 1
    state = controller_init()
    control, _ = birdview_agent_control(
        locs, jnp.asarray(0.5), jnp.asarray(4), state)
    steer, throttle, brake = np.asarray(control)
    assert steer == 0.0 and throttle == 0.0 and brake == 1.0


def test_birdview_decode_turn_sign():
    # Waypoints curving to +lateral (right in CARLA frame) -> positive steer.
    locs = _straight_locations(5.0)
    locs[:, 0] += np.linspace(0.05, 0.4, 5)   # drift columns rightward
    state = controller_init()
    control, _ = birdview_agent_control(
        jnp.asarray(locs), jnp.asarray(5.0), jnp.asarray(1), state)
    assert float(control[0]) > 0.05


def test_decode_jit_vmap():
    locs = jnp.tile(jnp.asarray(_straight_locations(5.0))[None], (8, 1, 1))
    speeds = jnp.full((8,), 3.0)
    cmds = jnp.full((8,), 4, jnp.int32)
    state = controller_init(batch_shape=(8,))
    fn = jax.jit(birdview_agent_control)
    control, state2 = fn(locs, speeds, cmds, state)
    assert control.shape == (8, 3)
    assert state2.speed_pid.count.shape == (8,)


def test_birdview_control_batched_matches_single_and_brakes():
    """Batched control decode == per-env decode; bunched waypoints (the
    net's stop signal) trigger the full-brake rule (birdview.py:161-164)
    through the batched path used on TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lbc_tpu.control import birdview_agent_control, controller_init

    bunched = jnp.tile(jnp.array([[0.0, -0.01]]), (5, 1))
    spread = jnp.stack([jnp.zeros(5), -jnp.linspace(0.1, 0.9, 5)], -1)
    locs = jnp.stack([bunched, spread])
    speed = jnp.array([5.0, 5.0])
    cmd = jnp.array([4, 4])
    ctrl0 = jax.tree.map(lambda x: jnp.stack([x] * 2), controller_init())

    c_b, _ = birdview_agent_control(locs, speed, cmd, ctrl0)
    singles = [birdview_agent_control(
        locs[i], speed[i], cmd[i],
        jax.tree.map(lambda x: x[i], ctrl0))[0] for i in range(2)]
    np.testing.assert_allclose(np.asarray(c_b), np.stack(singles),
                               atol=1e-6)
    assert float(c_b[0, 2]) == 1.0      # full brake
    assert float(c_b[1, 1]) > 0.0      # throttle when moving on


def _legacy_oracle(errors, kp, ki, kd, dt, window):
    """The upstream controller.py formula, deque and all."""
    buf = deque(maxlen=window)
    out = []
    for e in errors:
        buf.append(e)
        if len(buf) >= 2:
            de = (buf[-1] - buf[-2]) / dt
            ie = sum(buf) * dt
        else:
            de, ie = 0.0, 0.0
        out.append(kp * e + kd * de / dt + ki * ie * dt)
    return np.array(out)


def test_legacy_vehicle_pid_matches_upstream_formula():
    from lbc_tpu.control import (LegacyPIDParams, legacy_controller_init,
                                 vehicle_pid_step)
    rng = np.random.RandomState(0)
    params = LegacyPIDParams(lat_kp=0.7, lat_ki=0.05, lat_kd=0.2,
                             lon_kp=0.9, lon_ki=0.03, lon_kd=0.1, dt=0.1)
    state = legacy_controller_init()
    step = jax.jit(vehicle_pid_step)

    pos = jnp.zeros(2)
    speeds = rng.uniform(0.0, 9.0, 40)
    targets = rng.uniform(0.0, 9.0, 40)
    # waypoints scattered around the (fixed, yaw=0) vehicle
    wps = rng.uniform(-20, 20, (40, 2))
    steers, throttles = [], []
    for i in range(40):
        state, steer, throttle = step(state, pos, jnp.float32(0.0),
                                      speeds[i], targets[i], wps[i],
                                      params)
        steers.append(float(steer))
        throttles.append(float(throttle))

    # oracle errors: speed error; signed heading-to-waypoint angle
    lon_err = targets - speeds
    ang = np.arccos(np.clip(wps[:, 0] / np.linalg.norm(wps, axis=1),
                            -1, 1)) * np.sign(wps[:, 1])
    ref_thr = np.clip(_legacy_oracle(lon_err, params.lon_kp, params.lon_ki,
                                     params.lon_kd, params.dt, 30), 0, 1)
    ref_str = np.clip(_legacy_oracle(ang, params.lat_kp, params.lat_ki,
                                     params.lat_kd, params.dt, 10), -1, 1)
    np.testing.assert_allclose(throttles, ref_thr, atol=1e-4)
    np.testing.assert_allclose(steers, ref_str, atol=1e-4)


def test_legacy_vehicle_pid_batched():
    from lbc_tpu.control import legacy_controller_init, vehicle_pid_step
    state = legacy_controller_init(batch_shape=(4,))
    pos = jnp.zeros((4, 2))
    yaw = jnp.zeros((4,))
    wp = jnp.tile(jnp.array([[10.0, 1.0]]), (4, 1))
    state, steer, throttle = vehicle_pid_step(
        state, pos, yaw, jnp.zeros(4), jnp.full((4,), 5.0), wp)
    assert steer.shape == (4,) and throttle.shape == (4,)
    assert np.all(np.asarray(throttle) > 0)   # below target speed
    assert np.all(np.asarray(steer) > 0)      # waypoint to the +cross side
