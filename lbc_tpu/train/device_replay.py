"""Device-resident DAgger replay buffer: frames never leave the TPU.

TPU-native redesign of the reference ReplayBuffer
(training/phase2_utils.py:190-289). The reference keeps (rgb, cmd, speed,
teacher target, birdview) tuples in host RAM and re-runs the frozen
teacher on the birdview every batch; here the rollout stores the teacher's
ALL-BRANCH waypoints directly (40 floats/frame), so the buffer needs no
birdview at all and fits comfortably in HBM as uint8 RGB + scalars.
Combined with on-device importance sampling this makes the whole DAgger
train phase transfer-free — per host->device transfer the tunneled TPU
client leaks ~2.3x the bytes moved (tools/leak_repro.py), which is what
OOM-killed round-2's host-buffer DAgger at scale.

The buffer is generic over its per-frame fields (a dict of arrays), so the
same eviction/sampling machinery backs both the image DAgger (rgb +
teacher branches; IMAGE_SPECS) and the privileged fork-expert DAgger
(packed BEV + label pixels; train/priv_dagger.py).

Semantics preserved:
* add: always insert; when full, evict the lowest-weight entries
  (phase2_utils.py:256-265 — batched: the M new frames overwrite the M
  lowest-weight slots instead of one-at-a-time pops).
* sample: with replacement, P(i) proportional to weight_i
  (weighted_random_choice, phase2_utils.py:14-19).
* update_weights / normalize_weights: per-sample loss becomes the next
  epoch's sampling weight (phase2_utils.py:240-254).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

# field name -> (per-frame shape, dtype)
IMAGE_SPECS = {
    'rgb': ((160, 384, 3), jnp.uint8),
    'teacher_branches': ((4, 5, 2), jnp.float32),  # [-1,1] BEV coords
    'command': ((), jnp.int32),
    'speed': ((), jnp.float32),
}


class DeviceReplay(NamedTuple):
    fields: Any                    # dict name -> (C, ...) array
    weight: jnp.ndarray            # (C,) float32 (sampling weights)
    new_weight: jnp.ndarray        # (C,) float32 (staged refresh)
    size: jnp.ndarray              # () int32

    # image-path conveniences (pytree flattening only sees the 4 slots)
    @property
    def rgb(self):
        return self.fields['rgb']

    @property
    def teacher_branches(self):
        return self.fields['teacher_branches']

    @property
    def command(self):
        return self.fields['command']

    @property
    def speed(self):
        return self.fields['speed']


def replay_init(capacity: int, specs=None) -> DeviceReplay:
    specs = IMAGE_SPECS if specs is None else specs
    return DeviceReplay(
        fields={k: jnp.zeros((capacity,) + shape, dtype)
                for k, (shape, dtype) in specs.items()},
        weight=jnp.zeros((capacity,), jnp.float32),
        new_weight=jnp.zeros((capacity,), jnp.float32),
        size=jnp.zeros((), jnp.int32))


@partial(jax.jit, donate_argnums=(0,))
def replay_add(buf: DeviceReplay, fields, weight, valid) -> DeviceReplay:
    """Insert M frames (invalid ones dropped). All args device arrays;
    `fields` a dict matching buf.fields with leading dim M, valid bool (M,).

    Slot assignment: empty slots first (ascending index), then occupied
    slots by ascending weight — i.e. the reference's evict-lowest rule,
    batched. Invalid frames scatter out of bounds with mode='drop'.
    """
    cap = buf.weight.shape[0]
    m = valid.shape[0]
    # rank the new frames: valid ones first, keeping rollout order
    order = jnp.argsort(jnp.where(valid, 0, 1), stable=True)
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # slot pool: empties (< size is occupied) get key -inf+index so they
    # fill in order; occupied slots keyed by current weight
    slot_idx = jnp.arange(cap)
    occupied = slot_idx < buf.size
    key = jnp.where(occupied, buf.weight,
                    -1e30 + slot_idx.astype(jnp.float32))
    pool = jnp.argsort(key, stable=True)         # empties, then lightest
    ranks = jnp.arange(m)
    slots = jnp.where(ranks < n_valid, pool[jnp.minimum(ranks, cap - 1)],
                      cap)                       # cap -> dropped

    def scatter(dst, src):
        return dst.at[slots].set(src[order], mode='drop')

    return DeviceReplay(
        fields={k: scatter(buf.fields[k], fields[k]) for k in buf.fields},
        weight=scatter(buf.weight, weight),
        new_weight=scatter(buf.new_weight, weight),
        size=jnp.minimum(buf.size + n_valid, cap))


def replay_sample_idx(buf: DeviceReplay, key, batch_size: int):
    """Importance-sampled indices, with replacement, P ∝ weight."""
    cap = buf.weight.shape[0]
    w = jnp.where(jnp.arange(cap) < buf.size, buf.weight, 0.0)
    w = jnp.maximum(w, 0.0)
    total = jnp.sum(w)
    # degenerate all-zero weights -> uniform over filled slots
    w = jnp.where(total > 0, w,
                  (jnp.arange(cap) < buf.size).astype(jnp.float32))
    logits = jnp.log(jnp.maximum(w, 1e-30))
    g = jax.random.gumbel(key, (batch_size, cap))
    return jnp.argmax(logits[None, :] + g, axis=-1)


def replay_update_weights(buf: DeviceReplay, idx, losses) -> DeviceReplay:
    """Stage refreshed weights (phase2_utils.py:240-248)."""
    return buf._replace(new_weight=buf.new_weight.at[idx].set(losses))


def replay_normalize(buf: DeviceReplay) -> DeviceReplay:
    """Promote staged weights (phase2_utils.py:250-254). Copies so
    weight/new_weight never alias — a donating train step would otherwise
    donate the same buffer twice."""
    return buf._replace(weight=jnp.copy(buf.new_weight))


def replay_top_k(buf: DeviceReplay, k: int):
    """Highest-weight frames for the visual audit
    (phase2_utils.py:273-289 / train_image_phase2.py:231-252).
    Returns (fields_at_topk: dict, weight (k,))."""
    cap = buf.weight.shape[0]
    w = jnp.where(jnp.arange(cap) < buf.size, buf.weight, -jnp.inf)
    _, idx = jax.lax.top_k(w, k)
    return {key: v[idx] for key, v in buf.fields.items()}, buf.weight[idx]
