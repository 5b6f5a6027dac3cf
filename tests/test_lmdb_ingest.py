"""LMDB ingestion path (data.episode_store.convert_lmdb_*).

The real `lmdb` module is not baked into this image, so these tests
inject a minimal read-only stand-in into sys.modules whose API surface
matches what the converter uses (lmdb.open -> env.begin -> txn.get).
The fixture bytes follow the reference on-disk schema exactly
(data_collector.py:234-252: len / rgb_%04d / birdview_%04d /
measurements_%04d / control_%04d keys, uint8 images, float32 vectors) —
so this pins our key names, shapes, and dtypes against the reference
contract without the binary dependency.
"""
import sys
import types

import numpy as np
import pytest

from lbc_tpu.data.episode_store import (Episode, convert_lmdb_dataset,
                                        convert_lmdb_episode, have_lmdb,
                                        list_episodes)


class _FakeTxn:
    def __init__(self, kv):
        self._kv = kv

    def get(self, key):
        return self._kv[key]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, kv):
        self._kv = kv

    def begin(self):
        return _FakeTxn(self._kv)


def _reference_episode_bytes(n=5, seed=0):
    """Key/value dict in the reference data_collector.py schema."""
    rng = np.random.RandomState(seed)
    kv = {b'len': str(n).encode()}
    for i in range(n):
        rgb = rng.randint(0, 256, (160, 384, 3), np.uint8)
        bv = rng.randint(0, 2, (320, 320, 7), np.uint8)
        meas = rng.randn(17).astype(np.float32)
        ctrl = rng.rand(3).astype(np.float32)
        kv[b'rgb_%04d' % i] = rgb.tobytes()
        kv[b'birdview_%04d' % i] = bv.tobytes()
        kv[b'measurements_%04d' % i] = meas.tobytes()
        kv[b'control_%04d' % i] = ctrl.tobytes()
    return kv


@pytest.fixture
def fake_lmdb(monkeypatch, tmp_path):
    """Install a stub lmdb module; returns {lmdb_dir_path: kv} registry."""
    stores = {}
    mod = types.ModuleType('lmdb')

    def _open(path, **kwargs):
        return _FakeEnv(stores[str(path)])

    mod.open = _open
    monkeypatch.setitem(sys.modules, 'lmdb', mod)
    return stores


def test_have_lmdb_gates_on_import(monkeypatch):
    monkeypatch.setitem(sys.modules, 'lmdb', None)  # import -> ImportError
    assert have_lmdb() is False
    with pytest.raises(RuntimeError, match='lmdb module not available'):
        convert_lmdb_episode('x', 'y')


def test_convert_episode_roundtrip(fake_lmdb, tmp_path):
    n = 5
    fake_lmdb[str(tmp_path / 'ep0')] = _reference_episode_bytes(n)
    out = convert_lmdb_episode(tmp_path / 'ep0', tmp_path / 'native' / 'ep0')
    ep = Episode(out)
    assert len(ep) == n
    assert ep.rgb.shape == (n, 160, 384, 3) and ep.rgb.dtype == np.uint8
    assert ep.measurements.shape == (n, 17)
    assert ep.measurements.dtype == np.float32
    assert ep.control.shape == (n, 3)
    # bit-packed BEV unpacks to the exact reference 7-channel planes
    kv = fake_lmdb[str(tmp_path / 'ep0')]
    for i in range(n):
        ref_bv = np.frombuffer(kv[b'birdview_%04d' % i],
                               np.uint8).reshape(320, 320, 7)
        np.testing.assert_array_equal(ep.birdview(i), ref_bv)
        ref_rgb = np.frombuffer(kv[b'rgb_%04d' % i],
                                np.uint8).reshape(160, 384, 3)
        np.testing.assert_array_equal(ep.rgb[i], ref_rgb)


def test_convert_dataset_scans_data_mdb_dirs(fake_lmdb, tmp_path):
    src = tmp_path / 'src'
    for name in ('ep_000', 'ep_001'):
        d = src / name
        d.mkdir(parents=True)
        (d / 'data.mdb').touch()     # the LMDB on-disk marker
        fake_lmdb[str(d)] = _reference_episode_bytes(3)
    (src / 'not_an_episode').mkdir()  # no data.mdb -> skipped
    (src / 'README.txt').write_text('x')

    out = tmp_path / 'native'
    assert convert_lmdb_dataset(src, out) == 2
    eps = list_episodes(out)
    assert [p.name for p in eps] == ['ep_000', 'ep_001']
    # converted episodes are trainable by the native reader
    ep = Episode(eps[0])
    assert len(ep) == 3 and ep.birdview(0).shape == (320, 320, 7)
