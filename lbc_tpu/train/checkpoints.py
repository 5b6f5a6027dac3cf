"""Checkpoint IO: orbax + the config.json contract.

The reference saves raw state_dict .th files at exponential epochs and
reloads the newest on --resume (train_birdview.py:31,164-180); the
benchmark CLI rebuilds the model from config.json next to the checkpoint
(benchmark_agent.py:27-48). Same layout here with orbax:

    log_dir/
      config.json
      model-{epoch}/   (orbax checkpoint of the TrainState)
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from .train_state import TrainState


def _ckpt_dirs(log_dir):
    out = []
    for p in Path(log_dir).glob('model-*'):
        m = re.fullmatch(r'model-(\d+)', p.name)
        if m and p.is_dir():
            out.append((int(m.group(1)), p))
    return sorted(out)


def save_checkpoint(log_dir, state: TrainState, epoch: int) -> Path:
    import orbax.checkpoint as ocp
    path = (Path(log_dir) / f'model-{epoch}').absolute()
    ckptr = ocp.StandardCheckpointer()
    state_np = jax.tree.map(np.asarray, state)
    ckptr.save(path, state_np, force=True)
    ckptr.wait_until_finished()
    ckptr.close()   # orbax's async thread pool is non-daemon; an unclosed
    return path     # checkpointer keeps the interpreter alive at exit


def load_checkpoint(path, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    template_np = jax.tree.map(np.asarray, template)
    restored = ckptr.restore(Path(path).absolute(), template_np)
    ckptr.close()
    return jax.tree.map(jax.numpy.asarray, restored)


def latest_checkpoint(log_dir) -> Optional[Path]:
    ckpts = _ckpt_dirs(log_dir)
    return ckpts[-1][1] if ckpts else None


def latest_epoch(log_dir) -> int:
    ckpts = _ckpt_dirs(log_dir)
    return ckpts[-1][0] if ckpts else -1
