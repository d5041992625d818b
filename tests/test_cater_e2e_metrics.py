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
    # per-action breakdown is an exact partition of the aggregate
    per = pm["per_action"]
    assert set(per) <= {"_rotate", "_contain", "_slide", "_pick_place"}
    assert sum(n for _, n in per.values()) == pm["action_cases"]
    weighted = sum(p * n for p, n in per.values()) / pm["action_cases"]
    assert abs(weighted - pm["action_precision"]) < 1e-9


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


def test_quadrant_level_precision_calibration():
    """Quadrant-level scoring (ambiguous-caption mode, train_cater_kl_e2e):
    GT renders still ceiling ~1.0, and a render whose mover lands at a
    DIFFERENT endpoint inside the same captioned quadrant must also pass —
    the property exact-endpoint scoring lacks and ambiguous captions need."""
    compact = cs.build_compact_cater(1, 12, seed=11, mode="ambiguous")
    pos = np.asarray(tc.clip_positions(np.float32(1.0), 10))
    vids = _gt_videos(compact, "val", pos)
    metas = compact["val"]["meta"]
    pm = tc.precision_metrics(vids[:, 1:], metas, compact["bank_index"],
                              compact["bank"], quadrant_level=True)
    assert pm["action_precision"] >= 0.9
    assert pm["referring_precision"] >= 0.95

    # displace one slide/pick-place mover's final frame within its quadrant:
    # re-render the last frame with the mover shifted ~20 px toward the
    # quadrant center; quadrant-level must accept what exact-level rejects
    bg = cs.floor_background()
    moved = []
    for m, meta in enumerate(metas):
        movers = [(n, it) for n, it in meta["movements"].items() if it]
        slides = [n for n, it in movers if it[0][0] in ("_slide",
                                                        "_pick_place")]
        if not slides:
            continue
        d = compact["val"]
        name_to_slot = {o["instance"]: s for s, o in enumerate(meta["objects"])}
        slot = name_to_slot[slides[0]]
        end = {o["instance"]: o for o in meta["objects"]}[
            slides[0]]["locations"]["1"]
        qc_top, qc_left = cs.world_to_topleft(
            1.5 if end[0] >= 0 else -1.5, 1.5 if end[1] >= 0 else -1.5, 0.0)
        top = d["top"][m, pos[-1]].copy()
        left = d["left"][m, pos[-1]].copy()
        if abs(int(top[slot]) - qc_top) < 8 and \
           abs(int(left[slot]) - qc_left) < 8:
            continue  # endpoint ~ quadrant center: displacement too small
        top[slot], left[slot] = qc_top, qc_left
        frame = cs.render_frame(compact["bank"], bg, d["sid"][m, pos[-1]],
                                top, left).astype(np.float64) / 127.5 - 1.0
        vid = vids[m, 1:].copy()
        vid[-1] = frame
        moved.append((vid, meta))
    assert moved, "seed must yield at least one displaceable mover"
    vids_m = np.stack([v for v, _ in moved])
    metas_m = [mt for _, mt in moved]
    pm_q = tc.precision_metrics(vids_m, metas_m, compact["bank_index"],
                                compact["bank"], quadrant_level=True)
    pm_x = tc.precision_metrics(vids_m, metas_m, compact["bank_index"],
                                compact["bank"], quadrant_level=False)
    assert pm_q["referring_precision"] > pm_x["referring_precision"]
    # forcing EVERY displaced mover onto its quadrant center occasionally
    # stacks it on another object's sprite (render-order occlusion kills
    # the NCC), so the ceiling here sits slightly below the GT ceiling
    assert pm_q["referring_precision"] >= 0.85


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
