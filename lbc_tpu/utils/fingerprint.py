"""Engine fingerprint for benchmark provenance.

Benchmark resume (bench/runner.py) used to happily mix summary.csv rows
produced by *different engine versions* — the "stale-resume trap" that
silently invalidated a full round of results (see CLAUDE.md). Every row is
now stamped with a short hash of all behavior-bearing sources (engine,
maps + assets, agents, control, render, ops, models, constants); on resume,
rows with a different stamp are quarantined instead of reused.

The reference has no analog (its results never survive an engine change
because the CARLA server binary is fixed); this mechanizes the equivalent
guarantee for a framework whose engine is in-tree and evolving.
"""
from __future__ import annotations

import hashlib
from pathlib import Path

_PKG = Path(__file__).resolve().parent.parent
_DIRS = ('engine', 'maps', 'maps/assets', 'agents', 'control', 'render',
         'ops', 'models')
_TOP_FILES = ('constants.py',)
_SUFFIXES = {'.py', '.json', '.c'}

_cached = None


def engine_fingerprint() -> str:
    """12-hex-char digest over every behavior-bearing source file."""
    global _cached
    if _cached is None:
        h = hashlib.sha256()
        for d in _DIRS:
            root = _PKG / d
            if not root.is_dir():
                continue
            for p in sorted(root.iterdir()):
                if p.is_file() and p.suffix in _SUFFIXES:
                    h.update(str(p.relative_to(_PKG)).encode())
                    h.update(p.read_bytes())
        for f in _TOP_FILES:
            h.update((_PKG / f).read_bytes())
        _cached = h.hexdigest()[:12]
    return _cached
