"""Training datasets over episode stores.

Capability parity with bird_view/utils/datasets/{birdview,image}_lmdb.py:
frame indexing reserves gap*n_step future frames, BEV samples get rotation
/ crop jitters with the PIXEL_OFFSET up-shift, future-waypoint labels come
from the measurement stream via the reference's world->crop-pixel formula
(birdview_lmdb.py:21-31,103-148), and a command-biased sampler mirrors
BiasedBirdViewDataset (birdview_lmdb.py:173-203). Batches are plain numpy
dicts ready for jnp.asarray — the device side stays pure.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..constants import (CROP_SIZE, GAP, MAP_SIZE, PIXEL_OFFSET,
                         PIXELS_PER_METER, STEPS)
from .episode_store import Episode, list_episodes, unpack_birdview


def world_to_crop_pixel(x, y, ox, oy, ori_ox, ori_oy, dx=0, dy=0):
    """Future world point -> label pixel in the jittered 192-crop.

    Composition of world_to_pixel + the crop shifts in
    birdview_lmdb.py:21-31,137-142; returns (pixel_x=col, pixel_y=row).
    """
    pdx = (x - ox) * PIXELS_PER_METER
    pdy = (y - oy) * PIXELS_PER_METER
    forward = pdx * ori_ox + pdy * ori_oy
    lateral = -pdx * ori_oy + pdy * ori_ox
    # col = lateral + 96 - dx; row = 182 - forward - dy (the constants fold
    # the reference's 320->192 crop shifts and +70 offset; with the default
    # dy = -PIXEL_OFFSET the ego anchor sits at (col 96, row 192))
    pixel_x = lateral + MAP_SIZE // 2 - (MAP_SIZE - CROP_SIZE) // 2 - dx
    pixel_y = 182.0 - forward - dy
    return pixel_x, pixel_y


@dataclass
class SampleConfig:
    crop_x_jitter: int = 5
    crop_y_jitter: int = 5
    angle_jitter: int = 5          # degrees
    gap: int = GAP
    n_step: int = STEPS
    include_rgb: bool = False
    batch_aug: int = 1


class FrameDataset:
    """Flat index over (episode, frame) with usable length reserved for
    future labels (birdview_lmdb.py:64-86)."""

    def __init__(self, dataset_dir, config: SampleConfig = SampleConfig(),
                 max_frames: Optional[int] = None):
        self.config = config
        self.episodes: List[Episode] = []
        self.index = []   # (episode_idx, frame_idx)
        reserve = config.gap * config.n_step
        for path in list_episodes(dataset_dir):
            ep = Episode(path)
            usable = len(ep) - reserve
            if usable <= 0:
                continue
            ei = len(self.episodes)
            self.episodes.append(ep)
            for i in range(usable):
                self.index.append((ei, i))
                if max_frames and len(self.index) >= max_frames:
                    break
            if max_frames and len(self.index) >= max_frames:
                break
        self.commands = np.array(
            [int(self.episodes[e].measurements[i][11])
             for e, i in self.index], np.int32)
        self.speeds = np.array(
            [float(np.linalg.norm(self.episodes[e].measurements[i][5:8]))
             for e, i in self.index], np.float32)

    def __len__(self):
        return len(self.index)

    def _labels(self, ep: Episode, i: int, ori_ox, ori_oy, dx, dy):
        m0 = ep.measurements[i]
        ox, oy = float(m0[0]), float(m0[1])
        locs = np.zeros((self.config.n_step, 2), np.float32)
        for k in range(1, self.config.n_step + 1):
            mf = ep.measurements[i + k * self.config.gap]
            px, py = world_to_crop_pixel(
                float(mf[0]), float(mf[1]), ox, oy, ori_ox, ori_oy, dx, dy)
            locs[k - 1] = (px, py)
        return locs

    def get_birdview_sample(self, idx, rng: np.random.RandomState,
                            packed_output: bool = False):
        """-> dict(birdview (192,192,7) f32 — or birdview_packed
        (192,192) uint8 when `packed_output` (28x less host->device
        traffic; unpack on device with unpack_birdview_jnp) —
        location_px (5,2), command, speed).
        Jitters per birdview_lmdb.py:103-125."""
        cfg = self.config
        e, i = self.index[idx]
        ep = self.episodes[e]
        m = ep.measurements[i]
        ori_ox, ori_oy = float(m[3]), float(m[4])
        speed = float(np.linalg.norm(m[5:8]))
        cmd = int(m[11])

        delta_deg = rng.randint(-cfg.angle_jitter, cfg.angle_jitter + 1) \
            if cfg.angle_jitter else 0
        dx = rng.randint(-cfg.crop_x_jitter, cfg.crop_x_jitter + 1) \
            if cfg.crop_x_jitter else 0
        dy = (rng.randint(0, cfg.crop_y_jitter + 1) if cfg.crop_y_jitter
              else 0) - PIXEL_OFFSET

        packed = np.asarray(ep.birdview_packed[i])
        if delta_deg != 0:
            from ..native import rotate_nearest_native
            rotated = rotate_nearest_native(packed, 160.0, 260.0,
                                            float(delta_deg))
            if rotated is None:
                import cv2
                mrot = cv2.getRotationMatrix2D((160, 260), delta_deg, 1.0)
                rotated = cv2.warpAffine(packed, mrot,
                                         packed.shape[1::-1],
                                         flags=cv2.INTER_NEAREST)
            packed = rotated
        cy, cx = 260 - CROP_SIZE // 2, 160
        crop = packed[dy + cy - CROP_SIZE // 2: dy + cy + CROP_SIZE // 2,
                      dx + cx - CROP_SIZE // 2: dx + cx + CROP_SIZE // 2]

        angle = np.arctan2(ori_oy, ori_ox) + np.deg2rad(delta_deg)
        locs = self._labels(ep, i, np.cos(angle), np.sin(angle), dx, dy)
        out = {'location_px': locs, 'command': cmd, 'speed': speed}
        if packed_output:
            out['birdview_packed'] = np.ascontiguousarray(crop)
        else:
            out['birdview'] = unpack_birdview(crop)
        return out

    def get_image_sample(self, idx, rng: np.random.RandomState):
        """-> dict(rgb (160,384,3) f32 [0,1], birdview (192,192,7),
        location_px (5,2) *BEV* labels, command, speed). No rotation jitter
        (image_lmdb.py:149-151)."""
        e, i = self.index[idx]
        ep = self.episodes[e]
        assert ep.rgb is not None, 'episode has no rgb stream'
        m = ep.measurements[i]
        sample = {}
        cy, cx = 260 - CROP_SIZE // 2, 160
        dy = -PIXEL_OFFSET
        packed = np.asarray(ep.birdview_packed[i])
        crop = packed[dy + cy - CROP_SIZE // 2: dy + cy + CROP_SIZE // 2,
                      cx - CROP_SIZE // 2: cx + CROP_SIZE // 2]
        sample['birdview'] = unpack_birdview(crop)
        sample['rgb'] = np.asarray(ep.rgb[i], np.float32) / 255.0
        ori_ox, ori_oy = float(m[3]), float(m[4])
        sample['location_px'] = self._labels(ep, i, ori_ox, ori_oy, 0, dy)
        sample['command'] = int(m[11])
        sample['speed'] = float(np.linalg.norm(m[5:8]))
        return sample


class BatchSampler:
    """Random (optionally command-biased) batch iterator.

    Epoch = batch_size x samples random draws (Wrap,
    birdview_lmdb.py:233-249); bias ratios per BiasedBirdViewDataset.
    """

    def __init__(self, dataset: FrameDataset, batch_size: int,
                 samples: int, seed: int = 0, cmd_biased: bool = False,
                 ratios=(0.25, 0.25, 0.25), image: bool = False,
                 packed: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.samples = samples
        self.rng = np.random.RandomState(seed)
        self.image = image
        self.packed = packed
        self.cmd_biased = cmd_biased
        if cmd_biased:
            cmds = dataset.commands.copy()
            # follow-like reassignment: slow frames count as FOLLOW
            cmds[(dataset.speeds <= 1.0)] = 4
            self.cmd_pools = {c: np.nonzero(cmds == c)[0] for c in
                              (1, 2, 3, 4)}
            for c in (1, 2, 3):
                if len(self.cmd_pools[c]) == 0:
                    self.cmd_pools[c] = np.arange(len(dataset))
            self.ratios = list(ratios) + [1.0 - sum(ratios)]

    def _draw_index(self):
        if self.cmd_biased:
            c = self.rng.choice([1, 2, 3, 4], p=self.ratios)
            pool = self.cmd_pools[c]
            return int(pool[self.rng.randint(len(pool))])
        return int(self.rng.randint(len(self.ds)))

    def __iter__(self):
        """Batches are assembled by a small thread pool (the native/cv2
        decode kernels release the GIL) and prefetched one step ahead —
        the stand-in for the reference's DataLoader worker processes
        (birdview_lmdb.py:246-249)."""
        from concurrent.futures import ThreadPoolExecutor

        if self.image:
            get = self.ds.get_image_sample
        elif self.packed:
            def get(idx, rng):
                return self.ds.get_birdview_sample(idx, rng,
                                                   packed_output=True)
        else:
            get = self.ds.get_birdview_sample

        _DTYPES = {'command': np.int32, 'birdview_packed': np.uint8}

        def make_batch(seed):
            rng = np.random.RandomState(seed)
            items = []
            for _ in range(self.batch_size):
                if self.cmd_biased:
                    c = rng.choice([1, 2, 3, 4], p=self.ratios)
                    pool = self.cmd_pools[c]
                    idx = int(pool[rng.randint(len(pool))])
                else:
                    idx = int(rng.randint(len(self.ds)))
                items.append(get(idx, rng))
            return {k: np.stack([it[k] for it in items]).astype(
                _DTYPES.get(k, np.float32)) for k in items[0]}

        seeds = self.rng.randint(0, 2 ** 31 - 1, size=self.samples)
        with ThreadPoolExecutor(max_workers=4) as pool:
            futures = [pool.submit(make_batch, int(s)) for s in seeds]
            for f in futures:
                yield f.result()
