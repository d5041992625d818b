"""Unit coverage for the generative direction-binding probes' caption
machinery (the model-driven parts run offline on saved checkpoints).

Validates, against the compact Modified Double MNIST arrays themselves,
that clause parsing recovers each digit's commanded initial direction
(the trajectories' first step must move that way) and that the sign/axis
token swaps stay inside the caption grammar.
"""

import numpy as np
import pytest

from probe_direction_binding2 import (
    AXIS_SWAP,
    DIR_TOKENS,
    SIGN_SWAP,
    clause_directions,
    swap_tokens,
)


@pytest.fixture(scope="module")
def compact_double():
    import mage_tpu.data.device_data as dd

    return dd.build_compact_double_modified(12, 8, seed=3)


def test_clause_directions_match_gt_tracks(compact_double):
    val = compact_double["val"]
    checked = 0
    for i in range(val["text"].shape[0]):
        dirs = clause_directions(val["text"][i])
        for (dy, dx), ykey, xkey in zip(dirs, ("ys1", "ys2"), ("xs1", "xs2")):
            assert (dy, dx) in DIR_TOKENS.values()
            step_y = int(val[ykey][i, 1]) - int(val[ykey][i, 0])
            step_x = int(val[xkey][i, 1]) - int(val[xkey][i, 0])
            # stop-at-wall can zero the first step only if the digit starts
            # AT the wall; starts are drawn U{0.15..0.85}, so step != 0
            assert (step_y, step_x) != (0, 0)
            assert np.sign(step_y) == dy and np.sign(step_x) == dx
            checked += 1
    assert checked == 2 * val["text"].shape[0]


def test_swaps_stay_in_grammar_and_compose(compact_double):
    from mage_tpu.data.tokenizers import MNIST_VOCAB

    inv = {v: k for k, v in MNIST_VOCAB.items()}
    text = compact_double["val"]["text"]
    for mapping, f in ((SIGN_SWAP, lambda d: (-d[0], -d[1])),
                       (AXIS_SWAP, lambda d: (d[1], d[0]))):
        swapped = swap_tokens(text, mapping)
        # all tokens remain in-vocab, non-direction tokens untouched
        assert set(np.unique(swapped)) <= set(inv)
        mask = ~np.isin(text, list(DIR_TOKENS))
        assert np.array_equal(swapped[mask], text[mask])
        for i in range(text.shape[0]):
            want = [f(d) for d in clause_directions(text[i])]
            got = clause_directions(swapped[i])
            assert got == want


def test_single_probe_swaps_agree_with_double():
    # the single-MNIST probe (probe_direction_binding.py) shares the same
    # vocabulary; its maps must be identical
    import probe_direction_binding as single

    assert single.DIR_TOKENS == DIR_TOKENS
    assert single.SIGN_SWAP == SIGN_SWAP
    assert single.AXIS_SWAP == AXIS_SWAP
