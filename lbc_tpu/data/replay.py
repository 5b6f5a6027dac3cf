"""DAgger replay buffer with importance weights.

Capability parity with ReplayBuffer (/root/reference/training/
phase2_utils.py:190-289): bounded capacity with lowest-weight eviction,
weighted (importance) sampling once weights are normalized, and per-sample
weight updates after each gradient step. Host-side numpy by design — the
buffer feeds the training loop, which is outside the jitted hot path
(SURVEY.md section 7.4 point 5).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class ReplayBuffer:
    def __init__(self, capacity: int = 200_000, seed: int = 0):
        self.capacity = capacity
        self.rng = np.random.RandomState(seed)
        self._fields: Optional[Dict[str, List[np.ndarray]]] = None
        self._weights: List[float] = []
        self._normalized = False

    def __len__(self):
        return len(self._weights)

    def add(self, weight: float, **sample):
        if self._fields is None:
            self._fields = {k: [] for k in sample}
        if len(self._weights) >= self.capacity:
            evict = int(np.argmin(self._weights))
            for k in self._fields:
                self._fields[k][evict] = sample[k]
            self._weights[evict] = float(weight)
        else:
            for k, v in sample.items():
                self._fields[k].append(v)
            self._weights.append(float(weight))
        self._normalized = False

    def normalize_weights(self):
        w = np.asarray(self._weights, np.float64)
        total = w.sum()
        self._probs = w / total if total > 0 else \
            np.full(len(w), 1.0 / max(len(w), 1))
        self._normalized = True

    def sample(self, batch_size: int):
        """-> (indices, dict of stacked fields). Importance-sampled
        (phase2_utils.py:240-254)."""
        if not self._normalized:
            self.normalize_weights()
        idx = self.rng.choice(len(self._weights), size=batch_size,
                              p=self._probs)
        batch = {k: np.stack([self._fields[k][i] for i in idx])
                 for k in self._fields}
        return idx, batch

    def update_weights(self, indices, new_weights):
        for i, w in zip(np.asarray(indices), np.asarray(new_weights)):
            self._weights[int(i)] = float(w)
        self._normalized = False

    def top_k(self, k: int):
        """Highest-weight samples for the visual audit
        (train_image_phase2.py:231-252)."""
        order = np.argsort(self._weights)[::-1][:k]
        return order, {key: np.stack([self._fields[key][i] for i in order])
                       for key in self._fields}
