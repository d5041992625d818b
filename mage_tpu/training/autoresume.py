"""Crash-resilient mid-stage resume for the e2e training chains.

The host VM can reset at any time (it did at both the r3->r4 boundary and
mid-round-4), killing multi-hour stage trainings with only the ``best``
params saved — a relaunch then retrains the whole stage. This helper
checkpoints the FULL loop state (params, optimizer state, host RNG key,
epoch, best-so-far, plus chain-specific extras such as the PID controller
state) under a ``last`` tag on the eval cadence, and restores it at loop
startup so a relaunch loses at most one save interval.

The reference has no resume at all for stage 2 (its main_mage.py:122
always starts from iteration 0); SURVEY.md §5 lists checkpoint/resume as
an aux subsystem and this extends the existing best/final parity
(training/checkpoint.py) with true mid-stage crash recovery.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np

from .checkpoint import Checkpointer

TAG = "last"


def save_last(ckpt: Checkpointer, epoch: int, best: float,
              state: dict) -> None:
    """Persist loop state after ``epoch`` finished. ``state`` values may be
    device arrays or pytrees (params / opt_state / rng / pid...)."""
    tree = {
        "epoch": np.int32(epoch),
        "best": np.float32(best),
        "state": jax.device_get(state),
    }
    ckpt.save(TAG, tree)


def try_restore_last(
    ckpt: Checkpointer, template: dict
) -> Optional[Tuple[int, float, Any]]:
    """Restore a ``save_last`` checkpoint if present and well-formed.

    ``template`` must mirror the ``state`` dict passed to ``save_last``
    (live arrays are fine; only shapes/dtypes/structure are used).
    Returns ``(next_epoch, best, state)`` with ``state`` placed on the
    default device, or ``None`` (fresh start) when absent or unreadable —
    a truncated write from a mid-save crash must not wedge the relaunch.
    """
    if not ckpt.exists(TAG):
        return None
    tpl = {
        "epoch": np.zeros((), np.int32),
        "best": np.zeros((), np.float32),
        "state": template,
    }
    try:
        r = ckpt.restore(TAG, tpl)
    except Exception as e:  # noqa: BLE001 — any corrupt ckpt => fresh start
        print(f"autoresume: ignoring unreadable {ckpt.path(TAG)}: {e}")
        return None
    state = jax.device_put(r["state"])
    return int(r["epoch"]) + 1, float(r["best"]), state
