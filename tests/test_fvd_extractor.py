"""Tests for the trained-FVD-extractor plumbing (train_fvd_extractor.py +
evals/fvd.py::resolve_extractor + evals/i3d.py::load_trained_extractor).

The full training loop is exercised by the CPU smoke
(train_fvd_extractor.py --tiny) and on-chip by the queue; these tests pin
the label construction, the extractor resolution order, and the
checkpoint round-trip through load_trained_extractor.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.evals.fvd import resolve_extractor
from mage_tpu.evals.i3d import load_trained_extractor
from train_fvd_extractor import ACTIONS, ActionI3D, action_labels


def test_action_labels_multi_hot():
    metas = [
        {"movements": {"obj1": [["_slide", None, 0, 5]],
                       "obj2": [["_rotate", None, 3, 9]]}},
        {"movements": {"obj1": [["_contain", "obj2", 0, 5]],
                       "obj2": [["_contain", "obj3", 6, 9]]}},
    ]
    y = action_labels(metas)
    assert y.shape == (2, len(ACTIONS))
    np.testing.assert_array_equal(y[0], [1, 1, 0, 0])  # slide + rotate
    np.testing.assert_array_equal(y[1], [0, 0, 0, 1])  # contain (dedup)


def test_resolve_extractor_fallback_is_random_mixed3c(tmp_path, monkeypatch):
    # an EXPLICITLY pinned extractor that is missing must fail loudly
    # rather than silently switch to the random-init regime (ADVICE r4 #3)
    monkeypatch.setenv("MAGE_FVD_EXTRACTOR", str(tmp_path / "nope"))
    monkeypatch.delenv("MAGE_I3D_TORCH", raising=False)
    with pytest.raises(FileNotFoundError):
        resolve_extractor("CATER-GEN-v2", batch_size=2)
    # auto-discovery with nothing to discover (cwd without runs/) falls
    # back to the documented random-init Mixed_3c regime
    monkeypatch.delenv("MAGE_FVD_EXTRACTOR", raising=False)
    monkeypatch.chdir(tmp_path)
    extract, prov, dim = resolve_extractor("CATER-GEN-v2", batch_size=2)
    assert "random-init" in prov and dim == 480
    feats = extract(np.zeros((2, 3, 32, 32, 3), np.uint8))
    assert feats.shape == (2, 480)


def test_load_trained_extractor_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_trained_extractor(str(tmp_path / "missing"))


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    """A minimal train_fvd_extractor.py-shaped output directory: real
    (random-init) I3D trunk variables + provenance."""
    from mage_tpu.training.checkpoint import Checkpointer

    out = tmp_path_factory.mktemp("fvdx")
    model = ActionI3D()
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 2, 32, 32, 3)), True)
    Checkpointer(str(out / "i3d")).save(
        "best", {"params": jax.device_get(variables["params"]["i3d"]),
                 "batch_stats": jax.device_get(
                     variables["batch_stats"]["i3d"])})
    with open(out / "provenance.json", "w") as fp:
        json.dump({"dataset": "CATER-GEN-v2", "generator_seed": 1000,
                   "val_action_acc_per_label": 0.9,
                   "val_action_acc_exact_set": 0.7}, fp)
    return str(out)


def test_load_trained_extractor_round_trip(trained_dir):
    extract, prov, dim = load_trained_extractor(trained_dir, batch_size=2)
    assert dim == 832 and "action-trained" in prov and "0.900" in prov
    feats = extract(np.random.RandomState(0)
                    .randint(0, 255, (3, 4, 32, 32, 3)).astype(np.uint8))
    assert feats.shape == (3, 832)
    assert np.all(np.isfinite(feats))


def test_resolve_extractor_prefers_trained_when_family_matches(
        trained_dir, monkeypatch):
    monkeypatch.setenv("MAGE_FVD_EXTRACTOR", trained_dir)
    monkeypatch.delenv("MAGE_I3D_TORCH", raising=False)
    _, prov, dim = resolve_extractor("CATER-GEN-v1", batch_size=2)
    assert "action-trained" in prov and dim == 832  # v1/v2 same family
    # family mismatch (MNIST eval) with the extractor EXPLICITLY pinned
    # must refuse rather than silently switch regimes (ADVICE r4 #3)
    with pytest.raises(ValueError):
        resolve_extractor("MovingMNIST", batch_size=2)
