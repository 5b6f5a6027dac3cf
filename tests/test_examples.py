"""Smoke-run every examples/ script in-process with tiny workloads.

These are the TPU-native ports of the reference's vendored sample
clients (misc/*.py); each main() accepts an argv list so the tests can
shrink tick counts to keep the suite fast.
"""
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parents[1] / 'examples'
sys.path.insert(0, str(EXAMPLES))


def _load(name):
    import importlib
    return importlib.import_module(name)


def test_tutorial(tmp_path):
    speed = _load('tutorial').main(
        ['--ticks', '25', '--out', str(tmp_path)])
    assert (tmp_path / 'camera.png').stat().st_size > 0
    assert (tmp_path / 'birdview.png').stat().st_size > 0
    assert speed >= 0.0


def test_spawn_npc():
    mean_speed = _load('spawn_npc').main(
        ['-n', '12', '-w', '8', '--ticks', '40'])
    assert mean_speed > 0.05          # traffic actually moves


def test_synchronous_mode():
    assert _load('synchronous_mode').main(['--ticks', '6']) is True


def test_dynamic_weather(tmp_path):
    out = _load('dynamic_weather').main(
        ['--ticks-per', '1', '--out', str(tmp_path / 'w.gif')])
    assert out.stat().st_size > 0


def test_vehicle_gallery(tmp_path):
    out = _load('vehicle_gallery').main(
        ['--frames', '4', '--out', str(tmp_path / 'g.gif')])
    assert out.stat().st_size > 0


def test_no_rendering_mode(tmp_path):
    out = _load('no_rendering_mode').main(
        ['--ticks', '8', '--every', '4', '--vehicles', '10',
         '--walkers', '10', '--out', str(tmp_path / 't.avi')])
    assert Path(out).stat().st_size > 0


def test_automatic_control(tmp_path):
    result = _load('automatic_control').main(
        ['--ticks', '12', '--vehicles', '8', '--walkers', '8',
         '--out', str(tmp_path / 'a.avi')])
    assert result in ('success', 'failure', 'timeout')
    assert (tmp_path / 'a.avi').stat().st_size > 0
