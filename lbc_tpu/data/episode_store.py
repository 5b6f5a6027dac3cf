"""Episode storage: TPU-friendly native format + LMDB-compat reader.

The reference stores one LMDB per episode with keys len / rgb_%04d /
birdview_%04d / measurements_%04d / control_%04d
(data_collector.py:234-252). Our native format keeps the same logical
schema as memory-mappable .npy arrays per episode directory, with the
7-channel binary BEV **bit-packed** into one uint8 plane (7x smaller, and
unpacking is a few vectorized bit-ops on device or host):

    episode_dir/
      rgb.npy           (N, 160, 384, 3) uint8      [optional]
      birdview_packed.npy (N, 320, 320)  uint8      bits 0..6 = channels
      measurements.npy  (N, 17) float32             (carla_utils.py:115-143)
      control.npy       (N, 3) float32              [steer, throttle, brake]

An `lmdb` reader is provided for ingesting original reference datasets when
the lmdb module is available (it is not baked into this image — gated).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..constants import N_BEV_CHANNELS


def pack_birdview(bv: np.ndarray) -> np.ndarray:
    """(..., 320, 320, 7) {0,1} -> (..., 320, 320) uint8 bitfield."""
    from ..native import pack_birdview_native
    out = pack_birdview_native(np.asarray(bv, np.float32))
    if out is not None:
        return out
    bv = (np.asarray(bv) > 0).astype(np.uint8)
    out = np.zeros(bv.shape[:-1], np.uint8)
    for c in range(N_BEV_CHANNELS):
        out |= bv[..., c] << c
    return out


def unpack_birdview(packed: np.ndarray, dtype=np.float32) -> np.ndarray:
    """(..., 320, 320) uint8 -> (..., 320, 320, 7) {0,1}."""
    if dtype == np.float32:
        from ..native import unpack_birdview_native
        out = unpack_birdview_native(np.asarray(packed))
        if out is not None:
            return out
    packed = np.asarray(packed)
    chans = [(packed >> c) & 1 for c in range(N_BEV_CHANNELS)]
    return np.stack(chans, axis=-1).astype(dtype)


def unpack_birdview_jnp(packed, dtype=None):
    """Device-side unpack (jnp)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    chans = [(packed >> c) & 1 for c in range(N_BEV_CHANNELS)]
    return jnp.stack(chans, axis=-1).astype(dtype)


def write_episode(path, birdview=None, measurements=None, control=None,
                  rgb=None, birdview_packed=None):
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if birdview_packed is None and birdview is not None:
        birdview_packed = pack_birdview(birdview)
    assert birdview_packed is not None and measurements is not None \
        and control is not None
    np.save(path / 'birdview_packed.npy', np.asarray(birdview_packed,
                                                     np.uint8))
    np.save(path / 'measurements.npy',
            np.asarray(measurements, np.float32))
    np.save(path / 'control.npy', np.asarray(control, np.float32))
    if rgb is not None:
        np.save(path / 'rgb.npy', np.asarray(rgb, np.uint8))
    return path


class Episode:
    """Lazy, memory-mapped episode."""

    def __init__(self, path):
        self.path = Path(path)
        self.birdview_packed = np.load(self.path / 'birdview_packed.npy',
                                       mmap_mode='r')
        self.measurements = np.load(self.path / 'measurements.npy',
                                    mmap_mode='r')
        self.control = np.load(self.path / 'control.npy', mmap_mode='r')
        rgb_path = self.path / 'rgb.npy'
        self.rgb = np.load(rgb_path, mmap_mode='r') if rgb_path.exists() \
            else None

    def __len__(self):
        return self.measurements.shape[0]

    def birdview(self, i) -> np.ndarray:
        return unpack_birdview(self.birdview_packed[i])


def list_episodes(dataset_dir) -> List[Path]:
    root = Path(dataset_dir)
    return sorted(p.parent for p in root.glob('**/measurements.npy'))


# ---------------------------------------------------------- LMDB ingestion
def have_lmdb() -> bool:
    try:
        import lmdb  # noqa: F401
        return True
    except ImportError:
        return False


def convert_lmdb_episode(lmdb_path, out_path) -> Optional[Path]:
    """Reference LMDB episode -> native episode (requires `lmdb`)."""
    if not have_lmdb():
        raise RuntimeError('lmdb module not available in this environment')
    import lmdb
    env = lmdb.open(str(lmdb_path), readonly=True, lock=False)
    with env.begin() as txn:
        n = int(txn.get(b'len'))
        rgb, bvp, meas, ctrl = [], [], [], []
        for i in range(n):
            rgb.append(np.frombuffer(
                txn.get(b'rgb_%04d' % i), np.uint8).reshape(160, 384, 3))
            bv = np.frombuffer(
                txn.get(b'birdview_%04d' % i),
                np.uint8).reshape(320, 320, 7)
            bvp.append(pack_birdview(bv))
            meas.append(np.frombuffer(
                txn.get(b'measurements_%04d' % i), np.float32))
            ctrl.append(np.frombuffer(
                txn.get(b'control_%04d' % i), np.float32))
    return write_episode(out_path, birdview_packed=np.stack(bvp),
                         measurements=np.stack(meas),
                         control=np.stack(ctrl), rgb=np.stack(rgb))


def convert_lmdb_dataset(src_dir, out_dir) -> int:
    """Convert every reference LMDB episode under `src_dir` (the
    data_collector.py on-disk layout: one LMDB directory per episode)
    into native episodes under `out_dir`; returns #converted. After
    this, FrameDataset trains directly on a reference-collected
    dataset."""
    src_dir, out_dir = Path(src_dir), Path(out_dir)
    n = 0
    for child in sorted(src_dir.iterdir()):
        if child.is_dir() and (child / 'data.mdb').exists():
            convert_lmdb_episode(child, out_dir / child.name)
            n += 1
    return n
