"""Action Precision and Referring-Expression Precision.

Semantics parity with reference eval_precision.py:51-171. The reference
uses spacy POS tagging + nltk tokenization to find verbs (:52-58); the
CATER caption grammar is a closed template, so an explicit verb list
reproduces spacy's behavior exactly on this domain ('is' is an AUX for
spacy and excluded here too) without the model download.

Parsing contract per sentence -> {'subject': [attrs], 'motion': kind,
'object': quadrant|coordinate|[attrs]|None}; kinds: slide / rotate /
pick-place / pick-contain (:66-80). Scoring: per-video Action Precision
and Referring-Expression Precision with best-of-two bipartite matching for
two-action videos (:117-171).
"""

from __future__ import annotations

import re
from typing import Optional

ATTRIBUTES = [
    "cone", "snitch", "sphere", "cylinder", "cube", "small", "medium",
    "large", "metal", "rubber", "gold", "gray", "red", "blue", "green",
    "brown", "purple", "cyan", "yellow",
]
QUADRANT = {"first": 1, "second": 2, "third": 3, "fourth": 4}
VERBS = ("sliding", "rotating", "picked", "placed", "containing")

_TOKEN_RE = re.compile(r"-?\d+|[A-Za-z]+|[(),.]")


def _tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


def sen_parse(text: str, mode: str = "ambiguous") -> list[dict]:
    text = re.sub(r"\[SEP]|\[CLS]", "", text)
    sentences = [s.strip() for s in text.split(".") if s.strip()]
    parsing = []
    for sen in sentences:
        toks = _tokenize(sen)
        verbs = [t for t in toks if t in VERBS]
        if not verbs:
            sub_att = [t for t in toks if t in ATTRIBUTES]
            parsing.append({"subject": sub_att, "motion": None, "object": None})
            continue
        sub = sen[: sen.find(verbs[0])]
        sub_att = [t for t in _tokenize(sub) if t in ATTRIBUTES]
        if verbs[0] == "rotating":
            motion, obj_att = "rotate", None
        else:
            motion, obj_att = None, None
            last = verbs[-1]
            obj = sen[sen.find(last) + len(last):]
            if last == "sliding":
                motion = "slide"
                obj_att = find_quadrant(obj) if mode == "ambiguous" else find_coordinate(obj)
            elif last == "placed":
                motion = "pick-place"
                obj_att = find_quadrant(obj) if mode == "ambiguous" else find_coordinate(obj)
            elif last == "containing":
                motion = "pick-contain"
                obj_att = [t for t in _tokenize(obj) if t in ATTRIBUTES]
        parsing.append({"subject": sub_att, "motion": motion, "object": obj_att})
    return parsing


def find_quadrant(text: str) -> Optional[int]:
    if "quadrant" in text:
        words = [t for t in _tokenize(text) if t in QUADRANT]
        return QUADRANT[words[0]] if words else None
    text = text.replace(" ", "")
    try:
        loc = text[text.find("(") + 1 : text.find(")")]
        x, y = loc.split(",")
        x, y = int(x), int(y)
        if x >= 0 and y >= 0:
            return 1
        if x < 0 <= y:
            return 2
        if x < 0 and y < 0:
            return 3
        return 4
    except Exception:
        return None


def find_coordinate(text: str) -> Optional[list[int]]:
    text = text.replace(" ", "")
    try:
        loc = text[text.find("(") + 1 : text.find(")")]
        x, y = loc.split(",")
        return [int(x), int(y)]
    except Exception:
        return None


def precision(gt: dict, gen: dict):
    """-> (tp_attr, fp_attr, tp_motion, fp_motion) — reference :117-141."""
    tp_a = fp_a = tp_m = fp_m = 0
    for attri in gt["subject"]:
        if attri in gen["subject"]:
            tp_a += 1
        else:
            fp_a += 1
    if gt["motion"] == gen["motion"]:
        tp_m += 1
        if gt["motion"] in {"slide", "pick-place"}:
            if gen["object"] is not None and gt["object"] == gen["object"]:
                tp_m += 1
            else:
                fp_m += 1
        elif gt["motion"] in {"pick-contain"}:
            for attri in gt["object"]:
                if gen["object"] is not None and attri in gen["object"]:
                    tp_a += 1
                else:
                    fp_a += 1
    else:
        fp_m += 1
    return tp_a, fp_a, tp_m, fp_m


def cross_check(gt_list: list, gen_list: list):
    """-> (action precision, referring-expression precision) per video,
    best bipartite match for 2-action videos — reference :143-171."""
    if len(gen_list) == 0:
        return 0, 0
    if len(gt_list) == 1 and len(gen_list) == 1:
        tp_a, fp_a, tp_m, fp_m = precision(gt_list[0], gen_list[0])
        return _safe_div(tp_m, tp_m + fp_m), _safe_div(tp_a, tp_a + fp_a)
    if len(gen_list) == 1:
        s0 = precision(gt_list[0], gen_list[0])
        s1 = precision(gt_list[1], gen_list[0])
    elif len(gt_list) == 1:
        s0 = precision(gt_list[0], gen_list[0])
        s1 = precision(gt_list[0], gen_list[1])
    else:
        s0 = tuple(map(sum, zip(precision(gt_list[0], gen_list[0]),
                                precision(gt_list[1], gen_list[1]))))
        s1 = tuple(map(sum, zip(precision(gt_list[1], gen_list[0]),
                                precision(gt_list[0], gen_list[1]))))
    p_m0 = _safe_div(s0[2], s0[2] + s0[3])
    p_a0 = _safe_div(s0[0], s0[0] + s0[1])
    p_m1 = _safe_div(s1[2], s1[2] + s1[3])
    p_a1 = _safe_div(s1[0], s1[0] + s1[1])
    if p_m0 > p_m1 or (p_m0 == p_m1 and p_a0 > p_a1):
        return p_m0, p_a0
    return p_m1, p_a1


def _safe_div(a, b):
    return a / b if b else 0.0
