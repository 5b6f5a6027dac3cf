"""Benchmark suite registry.

Capability parity with /root/reference/benchmark/__init__.py:14-220: the
same 60+ suite names, weather sets, traffic densities, aliases, and the
same `poses_txt` / `col_is_failure` wiring — but `make_suite` builds a
batched DrivingEnv instead of a CARLA client.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple

from ..constants import WEATHER_1, WEATHER_2, WEATHER_3, WEATHER_4
from ..engine import DrivingEnv, EnvConfig

POSES = Path(__file__).parent / 'poses'

_suites = {}


@dataclass(frozen=True)
class SuiteConfig:
    name: str
    town: str
    poses_txt: str
    weathers: Tuple[int, ...]
    n_vehicles: int = 0
    n_pedestrians: int = 0
    col_is_failure: bool = False
    respawn_peds: bool = True
    # Config-parity field only: the reference uses it to filter two-wheeled
    # vehicle blueprints out of the CARLA spawn pool
    # (carla_utils.py:394-422); this engine's NPC pool contains no
    # two-wheelers at all (engine/npc.py uses one car bbox class), so the
    # flag is ALWAYS effectively true and intentionally unconsumed.
    disable_two_wheels: bool = False
    # explicit pose list overriding poses_txt (set via .restricted())
    poses_list: Optional[Tuple[Tuple[int, int], ...]] = None

    @property
    def poses(self) -> List[Tuple[int, int]]:
        if self.poses_list is not None:
            return [tuple(p) for p in self.poses_list]
        lines = (POSES / self.poses_txt).read_text().strip().splitlines()
        return [tuple(int(v) for v in ln.split()) for ln in lines]

    def restricted(self, poses=None, weathers=None) -> 'SuiteConfig':
        """Copy of this suite limited to a task subset (debug/tests)."""
        kw = {}
        if poses is not None:
            kw['poses_list'] = tuple(tuple(p) for p in poses)
        if weathers is not None:
            kw['weathers'] = tuple(weathers)
        return dataclasses.replace(self, **kw)

    def all_tasks(self):
        """(weather, (start, target), run_name) generator
        (base_suite.py:33-37)."""
        for weather in self.weathers:
            for start, target in self.poses:
                yield weather, (start, target), \
                    f's{start}_t{target}_w{weather}'

    def make_env(self, max_vehicles: int = 0, max_walkers: int = 0):
        return DrivingEnv(EnvConfig(
            town=self.town, n_vehicles=self.n_vehicles,
            n_pedestrians=self.n_pedestrians,
            max_vehicles=max(max_vehicles, self.n_vehicles),
            max_walkers=max(max_walkers, self.n_pedestrians),
            col_is_failure=self.col_is_failure,
            respawn_peds=self.respawn_peds))


def _add(suite_name, **kwargs):
    assert suite_name not in _suites, f'{suite_name} already registered'
    if 'Town01' in suite_name:
        town = 'Town01'
    elif 'Town02' in suite_name:
        town = 'Town02'
    else:
        raise ValueError(f'no town specified: {suite_name}')

    benchmark = 'carla100' if 'NoCrash' in suite_name else 'corl2017'
    if 'Turn' in suite_name:
        suite = 'turn'
    elif 'Straight' in suite_name:
        suite = 'straight'
    elif 'Full' in suite_name:
        suite = 'full'
    elif 'NoCrash' in suite_name:
        suite = 'nocrash'
    else:
        raise ValueError(f'no suite specified: {suite_name}')

    _suites[suite_name] = SuiteConfig(
        name=suite_name, town=town,
        poses_txt=f'{benchmark}/{suite}_{town}.txt',
        col_is_failure='NoCrash' in suite_name,
        **kwargs)


# ============= Register Suites (benchmark/__init__.py:47-147) ============ #
_add('FullTown01-v0', n_vehicles=0, weathers=WEATHER_1, respawn_peds=False)
_add('FullTown01-v1', n_vehicles=0, weathers=WEATHER_1)
_add('StraightTown01-v1', n_vehicles=0, weathers=WEATHER_1)
_add('TurnTown01-v1', n_vehicles=0, weathers=WEATHER_1)

_add('FullTown01-v2', n_vehicles=0, weathers=WEATHER_2)
_add('StraightTown01-v2', n_vehicles=0, weathers=WEATHER_2)
_add('TurnTown01-v2', n_vehicles=0, weathers=WEATHER_2)

_add('FullTown01-v3', n_vehicles=20, n_pedestrians=50, weathers=WEATHER_1)
_add('FullTown01-v4', n_vehicles=20, n_pedestrians=50, weathers=WEATHER_2)
_add('FullTown01-v3-np', n_vehicles=20, n_pedestrians=0, weathers=WEATHER_1)
_add('FullTown01-v4-np', n_vehicles=20, n_pedestrians=0, weathers=WEATHER_2)

_add('FullTown02-v1', n_vehicles=0, weathers=WEATHER_1)
_add('StraightTown02-v1', n_vehicles=0, weathers=WEATHER_1)
_add('TurnTown02-v1', n_vehicles=0, weathers=WEATHER_1)

_add('FullTown02-v2', n_vehicles=0, weathers=WEATHER_2)
_add('StraightTown02-v2', n_vehicles=0, weathers=WEATHER_2)
_add('TurnTown02-v2', n_vehicles=0, weathers=WEATHER_2)

_add('FullTown02-v3', n_vehicles=15, n_pedestrians=50, weathers=WEATHER_1)
_add('FullTown02-v4', n_vehicles=15, n_pedestrians=50, weathers=WEATHER_2)
_add('FullTown02-v3-np', n_vehicles=15, n_pedestrians=0, weathers=WEATHER_1)
_add('FullTown02-v4-np', n_vehicles=15, n_pedestrians=0, weathers=WEATHER_2)

_add('NoCrashTown01-v1', n_vehicles=0, disable_two_wheels=True,
     weathers=WEATHER_1)
_add('NoCrashTown01-v2', n_vehicles=0, disable_two_wheels=True,
     weathers=WEATHER_3)
_add('NoCrashTown01-v3', n_vehicles=20, disable_two_wheels=True,
     n_pedestrians=50, weathers=WEATHER_1)
_add('NoCrashTown01-v4', n_vehicles=20, disable_two_wheels=True,
     n_pedestrians=50, weathers=WEATHER_3)
_add('NoCrashTown01-v5', n_vehicles=100, disable_two_wheels=True,
     n_pedestrians=250, weathers=WEATHER_1)
_add('NoCrashTown01-v6', n_vehicles=100, disable_two_wheels=True,
     n_pedestrians=250, weathers=WEATHER_3)
_add('NoCrashTown01-v3-np', n_vehicles=20, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_1)
_add('NoCrashTown01-v4-np', n_vehicles=20, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_3)
_add('NoCrashTown01-v5-np', n_vehicles=100, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_1)
_add('NoCrashTown01-v6-np', n_vehicles=100, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_3)

_add('NoCrashTown02-v1', n_vehicles=0, disable_two_wheels=True,
     weathers=WEATHER_1)
_add('NoCrashTown02-v2', n_vehicles=0, disable_two_wheels=True,
     weathers=WEATHER_3)
_add('NoCrashTown02-v3', n_vehicles=15, disable_two_wheels=True,
     n_pedestrians=50, weathers=WEATHER_1)
_add('NoCrashTown02-v4', n_vehicles=15, disable_two_wheels=True,
     n_pedestrians=50, weathers=WEATHER_3)
_add('NoCrashTown02-v5', n_vehicles=70, disable_two_wheels=True,
     n_pedestrians=150, weathers=WEATHER_1)
_add('NoCrashTown02-v6', n_vehicles=70, disable_two_wheels=True,
     n_pedestrians=150, weathers=WEATHER_3)
_add('NoCrashTown02-v3-np', n_vehicles=15, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_1)
_add('NoCrashTown02-v4-np', n_vehicles=15, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_3)
_add('NoCrashTown02-v5-np', n_vehicles=70, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_1)
_add('NoCrashTown02-v6-np', n_vehicles=70, disable_two_wheels=True,
     n_pedestrians=0, weathers=WEATHER_3)

_add('NoCrashTown01-v7', n_vehicles=100, n_pedestrians=250,
     weathers=WEATHER_1)
_add('NoCrashTown01-v8', n_vehicles=100, n_pedestrians=250,
     weathers=WEATHER_2)
_add('NoCrashTown02-v7', n_vehicles=70, n_pedestrians=150,
     weathers=WEATHER_1)
_add('NoCrashTown02-v8', n_vehicles=70, n_pedestrians=150,
     weathers=WEATHER_2)

_add('FullTown01-v5', n_vehicles=0, weathers=WEATHER_4)
_add('FullTown01-v6', n_vehicles=20, weathers=WEATHER_4)
_add('StraightTown01-v3', n_vehicles=0, weathers=WEATHER_4)
_add('TurnTown01-v3', n_vehicles=0, weathers=WEATHER_4)

_add('FullTown02-v5', n_vehicles=0, weathers=WEATHER_4)
_add('FullTown02-v6', n_vehicles=15, weathers=WEATHER_4)
_add('StraightTown02-v3', n_vehicles=0, weathers=WEATHER_4)
_add('TurnTown02-v3', n_vehicles=0, weathers=WEATHER_4)

_add('NoCrashTown01_noweather_empty', weathers=(1,), n_vehicles=0)
_add('NoCrashTown01_noweather_regular', weathers=(1,), n_vehicles=20,
     n_pedestrians=50)
_add('NoCrashTown01_noweather_dense', weathers=(1,), n_vehicles=100,
     n_pedestrians=250)

_add('NoCrashTown02_noweather_empty', weathers=(1,), n_vehicles=0)
_add('NoCrashTown02_noweather_regular', weathers=(1,), n_vehicles=15,
     n_pedestrians=50)
_add('NoCrashTown02_noweather_dense', weathers=(1,), n_vehicles=70,
     n_pedestrians=200)

_add('StraightTown01-noweather', n_vehicles=0, weathers=(1,))
_add('TurnTown01-noweather', n_vehicles=0, weathers=(1,))
_add('FullTown01-noweather-nav', n_vehicles=0, weathers=(1,))
_add('FullTown01-noweather', n_vehicles=20, weathers=(1,))

_add('StraightTown02-noweather', n_vehicles=0, weathers=(1,))
_add('TurnTown02-noweather', n_vehicles=0, weathers=(1,))
_add('FullTown02-noweather-nav', n_vehicles=0, weathers=(1,))
_add('FullTown02-noweather', n_vehicles=15, weathers=(1,))

_aliases = {
    'town1': [
        'FullTown01-v1', 'FullTown01-v2', 'FullTown01-v3', 'FullTown01-v4',
        'StraightTown01-v1', 'StraightTown01-v2',
        'TurnTown01-v1', 'TurnTown01-v2'],
    'town2': [
        'FullTown02-v1', 'FullTown02-v2', 'FullTown02-v3', 'FullTown02-v4',
        'StraightTown02-v1', 'StraightTown02-v2',
        'TurnTown02-v1', 'TurnTown02-v2'],
    'town1p': [
        'FullTown01-v5', 'FullTown01-v6',
        'StraightTown01-v3', 'TurnTown01-v3',
        'FullTown01-v5', 'FullTown01-v6'],
    'town2p': [
        'FullTown02-v5', 'FullTown02-v6',
        'StraightTown02-v3', 'TurnTown02-v3',
        'FullTown02-v5', 'FullTown02-v6'],
    'ntown1p': ['NoCrashTown01-v7', 'NoCrashTown01-v8'],
    'ntown2p': ['NoCrashTown02-v7', 'NoCrashTown02-v8'],
    'empty': [
        'NoCrashTown01-v1', 'NoCrashTown01-v2',
        'NoCrashTown02-v1', 'NoCrashTown02-v2'],
    'regular': [
        'NoCrashTown01-v3', 'NoCrashTown01-v4',
        'NoCrashTown02-v3', 'NoCrashTown02-v4'],
    'regular-np': [
        'NoCrashTown01-v3-np', 'NoCrashTown01-v4-np',
        'NoCrashTown02-v3-np', 'NoCrashTown02-v4-np'],
    'dense': [
        'NoCrashTown01-v5', 'NoCrashTown01-v6',
        'NoCrashTown02-v5', 'NoCrashTown02-v6'],
    'dense-np': [
        'NoCrashTown01-v5-np', 'NoCrashTown01-v6-np',
        'NoCrashTown02-v5-np', 'NoCrashTown02-v6-np'],
    # compact student-agent evaluation: CoRL straights/nav both towns +
    # nav-dynamic + NoCrash regular/dense (one invocation amortizes the
    # per-process model-init compile over the TPU tunnel)
    'student-eval': [
        'StraightTown01-v1', 'TurnTown01-v1', 'FullTown01-v1',
        'FullTown01-v3', 'FullTown02-v1', 'FullTown02-v3',
        'NoCrashTown01-v3', 'NoCrashTown01-v5'],
}
_aliases['all'] = _aliases['town1'] + _aliases['town2']

ALL_SUITES = list(_suites.keys()) + list(_aliases.keys())


def make_suite(suite_name: str) -> SuiteConfig:
    assert suite_name in _suites, f'{suite_name} is not registered'
    return _suites[suite_name]


def get_suites(suite_name: str):
    if suite_name.lower() in _aliases:
        return _aliases[suite_name.lower()]
    return [suite_name]
