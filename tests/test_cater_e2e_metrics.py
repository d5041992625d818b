"""Calibration tests for the CATER e2e tracking-precision metric.

The sprite-tracking Action/Referring precision (train_cater_e2e.py) stands
in for the reference's SwinBERT-caption + eval_precision.py workflow
(/root/reference/README.md:9-16, eval_precision.py:117-171). Its value as
a metric rests on the GT ceiling being ~1.0: ground-truth renders must
score near-perfect, so any deficit measured on generated video is the
generator's. These tests pin that calibration.
"""

import numpy as np
import pytest

from mage_tpu.data.generators import cater_synthetic as cs

tc = pytest.importorskip("train_cater_e2e")


def _gt_videos(compact, split, pos):
    bg = cs.floor_background()
    d = compact[split]
    vids = []
    for m in range(d["sid"].shape[0]):
        frames = [
            cs.render_frame(compact["bank"], bg, d["sid"][m, t],
                            d["top"][m, t], d["left"][m, t])
            for t in pos
        ]
        vids.append(np.stack(frames))
    return np.stack(vids).astype(np.float64) / 127.5 - 1.0


def test_gt_precision_ceiling_near_one():
    """Speed-1.0 clips of GT renders must track to ~1.0 on both metrics."""
    compact = cs.build_compact_cater(1, 16, seed=5)
    pos = np.asarray(tc.clip_positions(np.float32(1.0), 10))
    assert pos[-1] == cs.T_STORE - 1  # full-span clip: actions complete
    vids = _gt_videos(compact, "val", pos)
    pm = tc.precision_metrics(vids[:, 1:], compact["val"]["meta"],
                              compact["bank_index"], compact["bank"])
    assert pm["action_cases"] == 32  # two movers per scene
    assert pm["action_precision"] >= 0.9
    assert pm["referring_precision"] >= 0.95


def test_background_does_not_match_sprites():
    """A background-only frame scores no sprite anywhere: the contrast and
    color gates must keep near-flat windows from inflating past tau (the
    failure mode that mis-scored departed objects as still present)."""
    compact = cs.build_compact_cater(1, 1, seed=0)
    bg = cs.floor_background().astype(np.float64)
    for key, idx in list(compact["bank_index"].items())[:6]:
        if key == ("blank",):
            continue
        spr = compact["bank"][idx]
        score = tc._ncc_near(bg, spr[..., :3].astype(np.float64),
                             spr[..., 3] > 0, 48, 48, 10)
        assert score < 0.45, (key, score)


def test_shuffled_videos_score_low():
    """Mismatched (video, meta) pairs must not pass: precision on shuffled
    assignments stays well below the GT ceiling."""
    compact = cs.build_compact_cater(1, 8, seed=7)
    pos = np.asarray(tc.clip_positions(np.float32(1.0), 10))
    vids = _gt_videos(compact, "val", pos)
    metas = compact["val"]["meta"]
    rolled = metas[1:] + metas[:1]
    pm = tc.precision_metrics(vids[:, 1:], rolled, compact["bank_index"],
                              compact["bank"])
    assert pm["action_precision"] <= 0.5
