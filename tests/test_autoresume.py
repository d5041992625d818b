"""Unit tests for training/autoresume.py (crash-resilient stage resume).

The e2e semantics (mid-stage-2 kill -> relaunch continues at the saved
epoch with optimizer state and RNG stream intact) were validated by
driving train_cater_e2e.py --tiny twice; these tests pin the helper's
contract: round-trip fidelity, fresh-start on absence, and fresh-start
(not a crash) on a corrupt/truncated checkpoint.
"""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.training.autoresume import save_last, try_restore_last
from mage_tpu.training.checkpoint import Checkpointer


@pytest.fixture()
def ckpt(tmp_path):
    return Checkpointer(str(tmp_path / "stage"))


def _state():
    return {
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
                   "b": jnp.ones((3,), jnp.bfloat16)},
        "step": jnp.asarray(123, jnp.int32),
        "rng": jax.random.PRNGKey(7),
    }


def test_round_trip(ckpt):
    state = _state()
    save_last(ckpt, epoch=41, best=0.25, state=state)
    out = try_restore_last(ckpt, _state())
    assert out is not None
    next_epoch, best, restored = out
    assert next_epoch == 42  # resumes AFTER the saved epoch
    assert best == pytest.approx(0.25)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_absent_means_fresh_start(ckpt):
    assert try_restore_last(ckpt, _state()) is None


def test_inf_best_round_trips(ckpt):
    # the loops start with best = float("inf"); the first save may happen
    # before any eval improved it
    save_last(ckpt, epoch=0, best=float("inf"), state=_state())
    _, best, _ = try_restore_last(ckpt, _state())
    assert best == float("inf")


def test_corrupt_checkpoint_falls_back(ckpt, capsys):
    save_last(ckpt, epoch=3, best=1.0, state=_state())
    # simulate a truncated write surviving a crash: gut the payload dir
    # but leave the metadata so orbax finds (and fails on) it
    for root, _dirs, files in os.walk(ckpt.path("last")):
        for f in files:
            if "METADATA" not in f and "manifest" not in f:
                open(os.path.join(root, f), "w").close()
    out = try_restore_last(ckpt, _state())
    if out is not None:  # orbax tolerated the gutting: force structural miss
        shutil.rmtree(ckpt.path("last"))
        os.makedirs(ckpt.path("last"))
        out = try_restore_last(ckpt, _state())
    assert out is None
    assert "autoresume: ignoring unreadable" in capsys.readouterr().out


def test_template_structure_mismatch_falls_back(ckpt):
    save_last(ckpt, epoch=3, best=1.0, state=_state())
    other = dict(_state(), pid=jnp.zeros((3,), jnp.float32))
    assert try_restore_last(ckpt, other) is None
