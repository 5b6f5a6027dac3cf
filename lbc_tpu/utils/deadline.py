"""Cooperative wall-clock stops for long training runs.

The TPU pipeline scripts (tools/round*.sh) launch trainers that own the
only chip for hours; a benchmark campaign queued behind them needs a way
to bound a RUNNING process without killing it (killing a TPU process
mid-step wedges the tunneled worker for 5-20 min — CLAUDE.md). Trainers
therefore poll a deadline file between epochs/episodes: if it exists and
holds an epoch-seconds timestamp that has passed, they checkpoint and
exit 0, letting the marker-gated pipeline advance to the next stage.

File protocol: ``$LBC_DEADLINE_DIR/lbc_deadline_<name>`` (dir defaults to
/tmp) containing a single integer/float epoch-seconds value. A missing,
empty, or unparseable file means "no deadline". Writing a new value
re-steers a running trainer; deleting the file removes the bound.
"""
from __future__ import annotations

import os
import time


def deadline_file(name: str) -> str:
    base = os.environ.get('LBC_DEADLINE_DIR', '/tmp')
    return os.path.join(base, f'lbc_deadline_{name}')


def wall_deadline_passed(name: str) -> bool:
    """True iff the named deadline file exists, parses, and has passed."""
    try:
        with open(deadline_file(name)) as f:
            value = float(f.read().strip())
    except (OSError, ValueError):
        return False
    return time.time() >= value
