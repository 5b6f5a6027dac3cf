"""Visual-contract tests: what the stage-1 image agent NEEDS to see.

Round 3's light-phase incident (CLAUDE.md) was exactly a broken visual
contract: the only head in the camera FOV was uncorrelated with the ego's
own light, so the student deadlocked at its first red. These tests pin the
contract for every light in both towns — an ego AT the stop line must see
its own phase: legible red pixels when its light is RED that turn green
when it is GREEN. Reference: the UE4 camera guarantees this physically
(carla_utils.py:666-676); our analytic renderer must guarantee it by
construction (shared-phase grouping in maps/roadnet.py:_assign_lights +
head boxes in render/camera.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lbc_tpu.engine.lights import GREEN, RED, light_states_md
from lbc_tpu.maps import build_map_data
from lbc_tpu.render.camera import render_camera


def _phase_ticks(m, light_i):
    """Ticks (t0=0) at which light_i is RED and GREEN."""
    md = jax.tree.map(jnp.asarray, m)
    t0 = jnp.zeros(m.junction_n_phases.shape[0], jnp.float32)
    # one full cycle at 10 Hz: n_phases * (green+yellow)
    j = int(m.light_junction[light_i])
    cycle_s = float(m.junction_n_phases[j]) * (
        float(m.junction_green_s[j]) + float(m.junction_yellow_s[j]))
    ticks = jnp.arange(int(cycle_s * 10) + 1)
    states = jax.vmap(lambda t: light_states_md(md, t0, t))(ticks)
    col = np.asarray(states[:, light_i])
    t_red = int(np.argmax(col == RED))
    t_green = int(np.argmax(col == GREEN))
    assert col[t_red] == RED and col[t_green] == GREEN
    return ticks[t_red], ticks[t_green], md, t0


def _render_at_stopline(m, md, light_i, tick, t0):
    lstate = light_states_md(md, t0, tick)
    pos = jnp.asarray(m.light_stop_pos[light_i])
    yaw = jnp.asarray(m.light_stop_yaw[light_i])
    no_v = jnp.zeros((1, 2)) + 1e6
    return np.asarray(render_camera(
        md, pos, yaw, no_v, jnp.zeros((1,)), jnp.asarray([False]),
        no_v, jnp.asarray([False]),
        md.light_draw_pos, lstate, jnp.asarray(1, jnp.int32)))


def _redness(img):
    return img[..., 0] - np.maximum(img[..., 1], img[..., 2])


def _greenness(img):
    return img[..., 1] - np.maximum(img[..., 0], img[..., 2])


@pytest.mark.parametrize('town', ['Town01', 'Town02'])
def test_own_light_legible_at_stop_line(town):
    m = build_map_data(town)
    n_lights = m.light_stop_pos.shape[0]
    ok = 0
    for i in range(n_lights):
        t_red, t_green, md, t0 = _phase_ticks(m, i)
        img_r = _render_at_stopline(m, md, i, t_red, t0)
        img_g = _render_at_stopline(m, md, i, t_green, t0)
        # pixels that are decisively red when OUR light is red
        red_px = _redness(img_r) > 0.25
        # ... and whose color flips to decisively green on our green
        flips = red_px & (_greenness(img_g) > 0.25)
        # >= a 6-pixel legible blob that tracks OUR phase (the crossing
        # street's heads flip the opposite way and never satisfy both)
        if flips.sum() >= 6:
            ok += 1
    # every light in both towns must satisfy the contract
    assert ok == n_lights, f'{town}: only {ok}/{n_lights} lights legible'


def test_light_size_at_detection_distance():
    """A head must still be legible from ~18 m out (the expert's braking
    envelope starts near there): the agent needs to SEE red before the
    stop line, not at it."""
    m = build_map_data('Town01')
    i = 0
    t_red, t_green, md, t0 = _phase_ticks(m, i)
    pos = np.asarray(m.light_stop_pos[i])
    yaw = float(m.light_stop_yaw[i])
    back = pos - 18.0 * np.array([np.cos(yaw), np.sin(yaw)], np.float32)
    lstate = light_states_md(md, t0, t_red)
    no_v = jnp.zeros((1, 2)) + 1e6
    img = np.asarray(render_camera(
        md, jnp.asarray(back), jnp.asarray(yaw),
        no_v, jnp.zeros((1,)), jnp.asarray([False]),
        no_v, jnp.asarray([False]),
        md.light_draw_pos, lstate, jnp.asarray(1, jnp.int32)))
    assert (_redness(img) > 0.25).sum() >= 4
