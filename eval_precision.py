#!/usr/bin/env python
"""Offline caption-based metrics CLI.

Mirrors the reference eval_precision.py:14-45: compare generated captions
(from an external video-captioning run, e.g. SwinBERT — reference
README.md:9-16) against ground-truth CATER captions; prints dataset-mean
Action Precision and Referring-Expression Precision.
"""

import argparse
import json
import os

from mage_tpu.evals.precision import cross_check, sen_parse


SELF_TEST_CASES = [
    # (ground truth, generated, expected action P, expected RE P)
    ("the small gold snitch is sliding to (2,-2) .",
     "the small gold snitch is sliding to (2,-2) .", 1.0, 1.0),
    ("the small gold snitch is sliding to (2,-2) .",
     "the small gold snitch is rotating .", 0.0, 1.0),
    ("the medium red metal cone is picked up and placed to (1,3) .",
     "the medium blue metal cone is picked up and placed to (1,3) .", 1.0, 0.75),
    ("the large cyan rubber cone is picked up and containing the snitch .",
     "the large cyan rubber cone is sliding to (0,0) .", 0.0, 1.0),
    # two-action video: best-of-two bipartite matching
    ("the snitch is rotating . the medium purple metal cone is sliding to the fourth quadrant .",
     "the medium purple metal cone is sliding to the fourth quadrant . the snitch is rotating .",
     1.0, 1.0),
]


def self_test() -> int:
    """Built-in metric self-check (reference eval_precision.py names its
    offline flow ``test_metrics_offline``, :14-45): runs the parser+matcher
    on caption pairs with hand-computed precisions and asserts them."""
    failures = 0
    for gt, gen, exp_act, exp_re in SELF_TEST_CASES:
        a, r = cross_check(sen_parse(gt), sen_parse(gen))
        ok = abs(a - exp_act) < 1e-9 and abs(r - exp_re) < 1e-9
        failures += not ok
        print(f"{'ok  ' if ok else 'FAIL'} act={a} (want {exp_act}) "
              f"re={r} (want {exp_re}) :: {gen!r}")
    print("self-test:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return failures


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="../datasets/CATER-GEN-v2")
    p.add_argument("--gen-caption", default=None,
                   help="JSON list of {image_id, caption} from the captioner")
    p.add_argument("--mode", default="ambiguous", choices=["explicit", "ambiguous"])
    p.add_argument("--self-test", action="store_true",
                   help="run the built-in metric self-check and exit")
    args = p.parse_args(argv)

    if args.self_test:
        raise SystemExit(self_test())
    if not args.gen_caption:
        p.error("--gen-caption is required (or use --self-test)")

    with open(args.gen_caption) as fp:
        gen_captions = json.load(fp)
    with open(os.path.join(args.data_root, f"test_{args.mode}.json")) as fp:
        gt_captions = json.load(fp)

    by_video = {
        os.path.basename(v["video"]): v["caption"] for v in gt_captions.values()
    }

    n = 0
    p_act = p_re = 0.0
    for rec in gen_captions:
        video_id = os.path.splitext(rec["image_id"])[0] + ".avi"
        gt = by_video[video_id]
        a, r = cross_check(
            sen_parse(gt, mode=args.mode),
            sen_parse(rec["caption"], mode=args.mode),
        )
        p_act += a
        p_re += r
        n += 1

    print("Action_Precision: ", p_act / max(n, 1))
    print("Referring_Expression_Precision: ", p_re / max(n, 1))


if __name__ == "__main__":
    main()
