"""Tests: caption parsing/precision metrics (reference eval_precision.py
semantics) and the double / modified-double / CATER-anno generators."""

import json

import numpy as np

from mage_tpu.evals.metrics import frechet_distance, gaussian_stats, psnr, ssim
from mage_tpu.evals.precision import cross_check, find_quadrant, precision, sen_parse


def test_sen_parse_slide_explicit():
    p = sen_parse("the small gold snitch is sliding to (1, -2).", mode="explicit")
    assert p == [{"subject": ["small", "gold", "snitch"], "motion": "slide",
                  "object": [1, -2]}]


def test_sen_parse_quadrant_and_rotate():
    p = sen_parse(
        "the cone is rotating. the large red rubber cube is picked up and "
        "placed to the first quadrant.",
        mode="ambiguous",
    )
    assert p[0] == {"subject": ["cone"], "motion": "rotate", "object": None}
    assert p[1]["motion"] == "pick-place" and p[1]["object"] == 1
    assert p[1]["subject"] == ["large", "red", "rubber", "cube"]


def test_sen_parse_contain():
    p = sen_parse(
        "the cone is picked up and containing the small blue sphere.",
        mode="ambiguous",
    )
    assert p[0]["motion"] == "pick-contain"
    assert p[0]["object"] == ["small", "blue", "sphere"]


def test_find_quadrant_from_coordinates():
    assert find_quadrant(" ( 1 , 2 ) ") == 1
    assert find_quadrant("(-1, 2)") == 2
    assert find_quadrant("(-1, -2)") == 3
    assert find_quadrant("(1, -2)") == 4
    assert find_quadrant("garbage") is None


def test_precision_and_cross_check():
    gt = sen_parse("the cone is sliding to (1, 2).", mode="explicit")
    perfect = cross_check(gt, gt)
    assert perfect == (1.0, 1.0)
    wrong = sen_parse("the cube is rotating.", mode="explicit")
    pm, pa = cross_check(gt, wrong)
    assert pm == 0.0 and pa == 0.0
    # two-action bipartite: reversed order must still score perfectly
    gt2 = sen_parse("the cone is rotating. the snitch is sliding to (1, 2).",
                    mode="explicit")
    gen2 = sen_parse("the snitch is sliding to (1, 2). the cone is rotating.",
                     mode="explicit")
    assert cross_check(gt2, gen2) == (1.0, 1.0)


def test_metrics_sanity():
    a = np.random.RandomState(0).rand(4, 8, 8, 3) * 2 - 1
    assert psnr(a, a) == float("inf")
    assert psnr(a, np.clip(a + 0.1, -1, 1)) > psnr(a, np.clip(a + 0.5, -1, 1))
    assert 0.99 < ssim(a, a) <= 1.0
    feats1 = np.random.RandomState(1).randn(100, 16)
    feats2 = np.random.RandomState(2).randn(100, 16) + 3.0
    d_same = frechet_distance(*gaussian_stats(feats1), *gaussian_stats(feats1))
    d_diff = frechet_distance(*gaussian_stats(feats1), *gaussian_stats(feats2))
    assert abs(d_same) < 1e-6 and d_diff > 10


def test_metrics_degenerate_sample_counts():
    # np.cov squeezes to 0-d at N == 1 or D == 1; the tiny golden configs
    # hit this via fvd_same_split_floor with one video per half. The stats
    # must stay finite and the distance must stay well-defined.
    one = np.random.RandomState(3).randn(1, 16)
    other = np.random.RandomState(4).randn(1, 16)
    mu, sigma = gaussian_stats(one)
    assert mu.shape == (16,) and sigma.shape == (16, 16)
    assert np.all(np.isfinite(sigma)) and np.allclose(sigma, 0)
    d = frechet_distance(*gaussian_stats(one), *gaussian_stats(other))
    expected = float(np.sum((one[0] - other[0]) ** 2))
    assert np.isfinite(d) and abs(d - expected) < 1e-9
    # D == 1 features: sigma must come back 2-D, distance finite.
    f1 = np.random.RandomState(5).randn(10, 1)
    f2 = np.random.RandomState(6).randn(10, 1) + 2.0
    mu1, s1 = gaussian_stats(f1)
    assert s1.shape == (1, 1)
    assert np.isfinite(frechet_distance(mu1, s1, *gaussian_stats(f2)))


def test_double_generator(tmp_path):
    from mage_tpu.data.generators import mnist_common as mc
    from mage_tpu.data.generators.mnist_double import generate_split, pair_motion_split

    rng = np.random.RandomState(0)
    images, labels = mc.load_digit_bank(None, samples_per_digit=3, seed=0)
    train_codes, val_codes = pair_motion_split(rng)
    assert len(train_codes) == 180 and len(val_codes) == 180
    assert not set(train_codes.tolist()) & set(val_codes.tolist())
    inst = generate_split(rng, train_codes, images, labels, 4)
    video, caption = inst[0]
    assert video.shape == (20, 64, 64)
    assert caption.count("the digit") == 2 and " and " in caption


def test_modified_double_generator(tmp_path):
    from mage_tpu.data.generators import mnist_common as mc
    from mage_tpu.data.generators.mnist_double import pair_motion_split
    from mage_tpu.data.generators.mnist_double_modified import (
        MOTION_STRINGS,
        generate_split,
        modified_trajectory,
    )

    rng = np.random.RandomState(0)
    # stop-at-wall: bounce=0 trajectory must end pinned at a wall
    ys, xs = modified_trajectory(rng, motion=0, direction=1, bounce=0)
    assert ys[-1] == mc.CANVAS  # moved down and stopped
    assert len(set(xs.tolist())) == 1

    images, labels = mc.load_digit_bank(None, samples_per_digit=3, seed=0)
    train_codes, _ = pair_motion_split(rng)
    inst = generate_split(rng, train_codes, images, labels, 6)
    for video, caption in inst:
        assert video.shape[1:] == (64, 64)
        words = caption.split(" is moving ")
        assert len(words) == 3
    # at least one one-way motion string shows up across instances
    assert any(
        any(f"moving {m} and" in c or c.endswith(f"moving {m} .") for m in MOTION_STRINGS[:4])
        for _, c in inst
    )


def test_cater_anno_generator(tmp_path):
    from mage_tpu.data.generators.cater_text_anno import main as anno_main

    scenes = tmp_path / "scenes"
    scenes.mkdir()
    for i in range(5):
        meta = {
            "movements": {
                "cone_1": [["_slide", None, 0, 30]],
                "spl_0": [["_contain", "cube_2", 10, 40]] if i % 2 else [],
            },
            "objects": [
                {"instance": "cone_1", "shape": "cone", "size": "small",
                 "color": "red", "material": "rubber",
                 "locations": {"0": [0.5, 0.5, 0], "1": [-1.2, 2.0, 0]}},
                {"instance": "spl_0", "shape": "spl", "size": "large",
                 "color": "gold", "material": "metal",
                 "locations": {"0": [1.0, 1.0, 0], "1": [1.5, -0.5, 0]}},
                {"instance": "cube_2", "shape": "cube", "size": "medium",
                 "color": "blue", "material": "rubber",
                 "locations": {"0": [0, 0, 0], "1": [0, 0, 0]}},
            ],
        }
        (scenes / f"CATER_{i:06d}.json").write_text(json.dumps(meta))

    anno_main([
        "--data-dir", str(tmp_path), "--mode", "explicit",
        "--dataset", "CATER-GEN-v2", "--max-videos", "5", "--skip-video-check",
    ])
    train = json.loads((tmp_path / "train_explicit.json").read_text())
    test = json.loads((tmp_path / "test_explicit.json").read_text())
    assert len(train) == 4 and len(test) == 1
    all_caps = [v["caption"] for v in {**train, **test}.values()]
    assert any("is sliding to (" in c for c in all_caps)
    assert any("picked up and containing the medium blue rubber cube" in c
               for c in all_caps)
    # parse our own generated captions with the eval parser (round trip)
    parsed = sen_parse(all_caps[0], mode="explicit")
    assert parsed[0]["motion"] in {"slide", "pick-contain"}


def test_eval_precision_self_test():
    """The CLI's built-in metric self-check (reference names its offline
    flow test_metrics_offline, eval_precision.py:14-45) passes."""
    import eval_precision

    assert eval_precision.self_test() == 0


def test_sen_parse_robust_to_malformed_text():
    """The parser's real input is SwinBERT-*generated* captions
    (reference README.md:9-16), which can leave the closed grammar.
    Malformed sentences must degrade gracefully (no exceptions, sane
    partial parses), never crash the metric run."""
    from mage_tpu.evals.precision import cross_check, sen_parse

    cases = [
        "",  # empty
        "...",  # punctuation only
        "the the the sliding",  # no attributes, dangling verb
        "a red thing is sliding to quadrant",  # quadrant word missing
        "sliding sliding sliding to the ( , ) position",  # broken coordinate
        "the sphere is sliding to ( 3 position",  # unclosed paren
        "the gold snitch is picked and and placed",  # no target at all
        "qwerty uiop 12345 () !!",  # garbage tokens
        "the cube is containing",  # contain with no object
        "the [CLS] [SEP] cone is rotating rotating",  # repeated verb + tags
        "the metal cylinder is sliding to (-3, -2) and also flying",  # off-grammar verb
    ]
    for text in cases:
        for mode in ("ambiguous", "explicit"):
            parses = sen_parse(text, mode)  # must not raise
            for p in parses:
                assert set(p) == {"subject", "motion", "object"}
                assert p["motion"] in (None, "slide", "rotate",
                                       "pick-place", "pick-contain")
    # and the per-video scoring path tolerates the degraded parses
    gt = sen_parse("the gold snitch is sliding to the first quadrant .")
    for text in cases:
        ap, rp = cross_check(gt, sen_parse(text))
        assert 0.0 <= ap <= 1.0 and 0.0 <= rp <= 1.0


def test_sen_parse_open_vocab_verb_detection():
    """Out-of-grammar verbs (an external SwinBERT captioner's output,
    reference README.md:9-16) must still split subject from object at the
    first verb — the reference gets this from spacy's generic VERB tags
    (eval_precision.py:52-58), not from the 4-verb motion branch."""
    # unseen verb 'moving': subject attrs must NOT include the object side
    p = sen_parse("the red cube is moving toward the blue sphere.")
    assert p[0]["subject"] == ["red", "cube"]
    assert p[0]["motion"] is None  # not one of the 4 grammar verbs
    # unseen -ed participle
    p = sen_parse("the small cone gets pushed to the first quadrant.")
    assert p[0]["subject"] == ["small", "cone"]
    # 'is'/'red' are not verbs (spacy AUX / adjective): with NO verb the
    # whole sentence's attrs become the subject (reference :60-62)
    p = sen_parse("the red cube near the gold snitch.")
    assert p[0]["subject"] == ["red", "cube", "gold", "snitch"]
    assert p[0]["motion"] is None
    # closed-grammar behavior unchanged: literal verb text picks motion
    p = sen_parse("the large metal cube is sliding to the first quadrant.")
    assert p[0]["motion"] == "slide" and p[0]["object"] == 1


def test_sen_parse_open_vocab_mixed_clause():
    # a free-text clause followed by a grammar clause: both parse, the
    # grammar clause still yields its motion
    p = sen_parse(
        "a cylinder is spinning around. the purple cone is rotating."
    )
    assert len(p) == 2
    assert p[0]["subject"] == ["cylinder"] and p[0]["motion"] is None
    assert p[1]["motion"] == "rotate"
