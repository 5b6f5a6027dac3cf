"""Experiment logging (reference: bird_view/utils/bz_utils/saver.py).

Same surface as the reference's `bzu.log` singleton: init(log_dir),
save_config / load_config (the config.json-next-to-checkpoint contract the
benchmark CLI depends on, saver.py:76-95 + benchmark_agent.py:27-48),
scalar() accumulation with end_epoch() flushing mean/std/min/max to
tensorboard, and image logging. loguru is replaced by stdlib logging
(loguru is not in this image).
"""
from __future__ import annotations

import json
import logging
import time
from collections import defaultdict
from pathlib import Path

import numpy as np


def _jsonable(v):
    if isinstance(v, (int, float, bool, str)) or v is None:
        return v
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return str(v)


def save_config(log_dir, config: dict):
    path = Path(log_dir) / 'config.json'
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(_jsonable(config), indent=2))
    return path


def load_config(checkpoint_or_dir) -> dict:
    """Config lookup keyed off a checkpoint path (saver.py:76-80): search
    the given path, then its parents (orbax checkpoints are directories
    sitting next to config.json)."""
    p = Path(checkpoint_or_dir)
    candidates = [p if p.is_dir() else p.parent]
    candidates += list(candidates[0].parents)[:2]
    for d in candidates:
        cfg = d / 'config.json'
        if cfg.exists():
            return json.loads(cfg.read_text())
    raise FileNotFoundError(f'no config.json near {checkpoint_or_dir}')


class Experiment:
    def __init__(self):
        self._log = logging.getLogger('lbc_tpu')
        self._scalars = defaultdict(list)
        self._writers = {}
        self.log_dir = None
        self.epoch = 0
        self._t0 = time.time()

    def init(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        handler = logging.FileHandler(self.log_dir / 'experiment.log')
        handler.setFormatter(logging.Formatter(
            '%(asctime)s %(levelname)s %(message)s'))
        self._log.addHandler(handler)
        self._log.setLevel(logging.INFO)
        try:
            from tensorboardX import SummaryWriter
            self._writers = {
                'train': SummaryWriter(str(self.log_dir / 'train')),
                'val': SummaryWriter(str(self.log_dir / 'val')),
            }
        except ImportError:
            self._writers = {}
        return self

    def info(self, msg, *args):
        self._log.info(msg, *args)

    def scalar(self, is_train=True, **kwargs):
        split = 'train' if is_train else 'val'
        for k, v in kwargs.items():
            self._scalars[(split, k)].append(float(v))

    def image(self, is_train=True, **kwargs):
        split = 'train' if is_train else 'val'
        w = self._writers.get(split)
        if w is None:
            return
        for k, v in kwargs.items():
            img = np.asarray(v)
            if img.dtype != np.uint8:
                img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            w.add_image(k, img, self.epoch, dataformats='HWC')

    def end_epoch(self, net=None):
        """Flush mean/std/min/max per scalar (saver.py:97-128)."""
        out = {}
        for (split, k), vals in self._scalars.items():
            arr = np.asarray(vals)
            stats = {'mean': arr.mean(), 'std': arr.std(),
                     'min': arr.min(), 'max': arr.max()}
            out[(split, k)] = stats
            w = self._writers.get(split)
            if w is not None:
                for stat, val in stats.items():
                    w.add_scalar(f'{k}/{stat}', val, self.epoch)
            self.info('%s %s: %s', split, k,
                      {s: round(float(v), 5) for s, v in stats.items()})
        self._scalars.clear()
        self.epoch += 1
        return out


log = Experiment()
