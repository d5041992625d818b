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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="../datasets/CATER-GEN-v2")
    p.add_argument("--gen-caption", required=True,
                   help="JSON list of {image_id, caption} from the captioner")
    p.add_argument("--mode", default="ambiguous", choices=["explicit", "ambiguous"])
    args = p.parse_args(argv)

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
