"""Compact, fully device-resident Single-Moving-MNIST dataset.

The tunneled single-chip backend moves ~0.5 MB/s host<->device, so
streaming rendered pixel batches (64x64x20 frames/clip) is ruinous. This
module ships the *inputs* of the dataset generator instead — the digit
bank (~N x 28 x 28 uint8), integer pixel trajectories, and caption tokens,
~10 MB for the full 10k/2k dataset — and re-renders frames on device with
batched ``dynamic_update_slice``.

Exactness contract (tested in tests/test_device_data.py):

- ``build_compact_single_mnist`` replays
  ``mage_tpu.data.generators.mnist_single`` RNG-call-for-RNG-call, so the
  compact arrays describe the *exact* records the .mrs generator writes
  for the same seed (reference dataset: data/mnist_caption_single.py).
- ``compose_frames`` reproduces ``mnist_common.render_video`` (single
  digit: paste at the integer track position; reference
  mnist_caption_single.py:111-128) after the standard /255 - 0.5
  normalization.
- ``clip_indices`` reproduces ``datasets.speed_subsample_indices``
  (reference dataload.py:246-258: interval from speed, linspace pick,
  repeat-last pad to frames_length) in exact integer math under jit, so
  speed-conditioned clips become cheap gathers of per-frame latents.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data.generators import mnist_common as mc

SEQ_LENGTH = 20  # stored frames per clip (mnist_single.SEQ_LENGTH)
IMAGE_SIZE = mc.IMAGE_SIZE
DIGIT_SIZE = mc.DIGIT_SIZE


def build_compact_single_mnist(
    num_train: int,
    num_val: int,
    seed: int = 0,
    mnist_npz: Optional[str] = None,
) -> dict:
    """-> {"bank": uint8 (N, 28, 28),
           "train"/"val": {"digit" (M,), "ys"/"xs" (M, 20), "text" (M, 32)}}.

    Follows generators/mnist_single.py's exact RNG sequence (digit pick,
    motion pick, direction, trajectory) so the described dataset is
    byte-identical to the record store the generator writes for ``seed``.
    """
    from mage_tpu.data.tokenizers import MNIST_VOCAB, VocabTokenizer

    rng = np.random.RandomState(seed)
    images, labels = mc.load_digit_bank(mnist_npz, seed=seed)
    train_codes, val_codes = mc.digit_motion_split(rng)
    tokenizer = VocabTokenizer(MNIST_VOCAB, split_mode="whitespace")

    def build_split(codes: np.ndarray, num: int) -> dict:
        digits, motions = codes % 10, codes // 10
        idx, ys, xs, text = [], [], [], []
        while len(idx) < num:
            # identical call order to mnist_single.generate_split /
            # generate_instance: randint(bank), choice(matches),
            # randint(direction), then bounce_trajectory's two rand()s
            i = rng.randint(images.shape[0])
            label = int(labels[i])
            matches = np.where(digits == label)[0]
            if len(matches) == 0:
                continue
            motion = int(motions[rng.choice(matches)])
            direction = int(rng.randint(0, 2))
            ty, tx = mc.bounce_trajectory(SEQ_LENGTH, rng, motion, direction)
            caption = "the digit %d is moving %s ." % (
                label, mc.MOTION_STRINGS[motion + 2 * direction]
            )
            idx.append(i)
            ys.append(ty)
            xs.append(tx)
            text.append(tokenizer.encode_padded(caption, 32))
        return {
            "digit": np.asarray(idx, np.int32),
            "ys": np.stack(ys).astype(np.int32),
            "xs": np.stack(xs).astype(np.int32),
            "text": np.stack(text).astype(np.int32),
        }

    return {
        "bank": images,
        "train": build_split(train_codes, num_train),
        "val": build_split(val_codes, num_val),
    }


def build_compact_double_modified(
    num_train: int,
    num_val: int,
    seed: int = 0,
    mnist_npz: Optional[str] = None,
    context_length: int = 32,
    bank: Optional[tuple] = None,
) -> dict:
    """Compact device-resident Modified Double Moving MNIST
    (reference data/mnist_caption_double_modified.py; generator parity:
    mage_tpu/data/generators/mnist_double_modified.py).

    Replays the .mrs generator's exact RNG call order (digit-pair pick,
    combo choice, distractor-digit rejection, per-digit direction/bounce +
    trajectory, distractor presence + IOU placement), so the compact
    arrays describe the same records ``mnist_double_modified.main`` writes
    for ``seed``. Variable-length tracks (digits freeze at walls) are
    edge-padded to SEQ_LENGTH+1 — physically exact continuation (a stopped
    digit stays put) — with the TRUE length kept in ``length`` so
    speed subsampling sees the same frame count as the written records.

    -> {"bank", split: {"d1","d2" (M,), "ys1","xs1","ys2","xs2" (M, 21),
        "length" (M,), "bg" (M,), "bg_y","bg_x" (M,), "has_bg" (M,),
        "text" (M, context_length)}}
    """
    from mage_tpu.data.generators.mnist_double import MOTION_IDXS, pair_motion_split
    from mage_tpu.data.generators.mnist_double_modified import (
        MOTION_STRINGS as MOD_MOTION_STRINGS,
        SEQ_LENGTH as MOD_SEQ,
        _iou_overlaps,
        modified_trajectory,
    )
    from mage_tpu.data.tokenizers import MNIST_VOCAB, VocabTokenizer

    rng = np.random.RandomState(seed)
    images, labels = (
        mc.load_digit_bank(mnist_npz, seed=seed) if bank is None else bank
    )
    train_codes, val_codes = pair_motion_split(rng)
    tokenizer = VocabTokenizer(MNIST_VOCAB, split_mode="whitespace")
    tmax = MOD_SEQ + 1

    def build_split(codes: np.ndarray, num: int) -> dict:
        pair_codes, combo_codes = codes % 100, codes // 100
        cols = {k: [] for k in ("d1", "d2", "ys1", "xs1", "ys2", "xs2",
                                "length", "bg", "bg_y", "bg_x", "has_bg",
                                "text")}
        while len(cols["d1"]) < num:
            idxs = rng.randint(images.shape[0], size=2)
            pair = 10 * int(labels[idxs[0]]) + int(labels[idxs[1]])
            matches = np.where(pair_codes == pair)[0]
            if len(matches) == 0:
                continue
            combo = int(combo_codes[rng.choice(matches)])
            while True:  # distractor digit differs from both movers
                bg = int(rng.randint(images.shape[0]))
                if labels[bg] not in (labels[idxs[0]], labels[idxs[1]]):
                    break
            motions = MOTION_IDXS[combo]
            tracks, dirs, bounces = [], [], []
            for m in motions:
                d, bn = int(rng.randint(0, 2)), int(rng.randint(0, 2))
                tracks.append(modified_trajectory(rng, int(m), d, bn))
                dirs.append(d)
                bounces.append(bn)
            tlen = max(t[0].shape[0] for t in tracks)
            tracks = [
                (np.pad(ys, (0, tmax - len(ys)), mode="edge"),
                 np.pad(xs, (0, tmax - len(xs)), mode="edge"))
                for ys, xs in tracks
            ]
            has_bg = int(rng.randint(0, 2))
            bg_y = bg_x = 0
            if has_bg:
                boxes = [
                    (int(t[0][0]), int(t[1][0]),
                     int(t[0][0]) + DIGIT_SIZE, int(t[1][0]) + DIGIT_SIZE)
                    for t in tracks
                ]
                while True:
                    bg_y = int((IMAGE_SIZE - DIGIT_SIZE) * rng.rand())
                    bg_x = int((IMAGE_SIZE - DIGIT_SIZE) * rng.rand())
                    box = (bg_y, bg_x, bg_y + DIGIT_SIZE, bg_x + DIGIT_SIZE)
                    if not any(_iou_overlaps(box, b) for b in boxes):
                        break
            caption = (
                "the digit %d is moving %s and the digit %d is moving %s ."
                % (
                    labels[idxs[0]],
                    MOD_MOTION_STRINGS[int(motions[0]) + 2 * dirs[0] + 4 * bounces[0]],
                    labels[idxs[1]],
                    MOD_MOTION_STRINGS[int(motions[1]) + 2 * dirs[1] + 4 * bounces[1]],
                )
            )
            cols["d1"].append(int(idxs[0]))
            cols["d2"].append(int(idxs[1]))
            cols["ys1"].append(tracks[0][0])
            cols["xs1"].append(tracks[0][1])
            cols["ys2"].append(tracks[1][0])
            cols["xs2"].append(tracks[1][1])
            cols["length"].append(tlen)
            cols["bg"].append(bg)
            cols["bg_y"].append(bg_y)
            cols["bg_x"].append(bg_x)
            cols["has_bg"].append(has_bg)
            cols["text"].append(tokenizer.encode_padded(caption, context_length))
        return {
            k: (np.stack(v) if k in ("ys1", "xs1", "ys2", "xs2", "text")
                else np.asarray(v)).astype(np.int32)
            for k, v in cols.items()
        }

    return {
        "bank": images,
        "train": build_split(train_codes, num_train),
        "val": build_split(val_codes, num_val),
    }


def compose_frames_double(
    bank: jax.Array,  # (N, 28, 28) normalized
    d1: jax.Array, y1: jax.Array, x1: jax.Array,  # (M,) each
    d2: jax.Array, y2: jax.Array, x2: jax.Array,
    bg: jax.Array, bg_y: jax.Array, bg_x: jax.Array, has_bg: jax.Array,
) -> jax.Array:
    """Render M two-digit (+ optional static distractor) frames on device
    -> (M, 64, 64, 1). Overlap composite = max, like render_video (the
    normalization is monotonic, so max commutes with /255-0.5)."""
    background = jnp.full((IMAGE_SIZE, IMAGE_SIZE), -0.5, bank.dtype)

    def paste(d, y, x):
        return jax.lax.dynamic_update_slice(background, bank[d], (y, x))

    def one(d1, y1, x1, d2, y2, x2, bg, by, bx, hb):
        frame = jnp.maximum(paste(d1, y1, x1), paste(d2, y2, x2))
        dist = jnp.where(hb > 0, paste(bg, by, bx), background)
        return jnp.maximum(frame, dist)

    frames = jax.vmap(one)(d1, y1, x1, d2, y2, x2, bg, bg_y, bg_x, has_bg)
    return frames[..., None]


def clip_indices_var(
    speed: jax.Array, length: jax.Array, frames_length: int = 16
) -> jax.Array:
    """speed in [0, 1), TRACED clip length -> (frames_length,) indices.

    Variable-length twin of ``clip_indices`` for datasets whose videos end
    early (modified-double: digits freeze at walls). count =
    round_half_even(length / (1 + speed)) like speed_subsample_indices
    (sample_speed [1, 2], min_interval 1); jnp.round is half-to-even like
    the generator's float64 np.round — the f32 quotient can disagree only
    within ~1 ulp of an exact .5 tie, unreachable for uniform speeds.
    Index floor(linspace) in exact integer math, repeat-last padded."""
    q = length.astype(jnp.float32) / (1.0 + speed.astype(jnp.float32))
    count = jnp.maximum(jnp.round(q).astype(jnp.int32), 1)
    i = jnp.minimum(jnp.arange(frames_length, dtype=jnp.int32), count - 1)
    return (i * (length - 1)) // jnp.maximum(count - 1, 1)


def normalize_bank(bank: np.ndarray) -> jax.Array:
    """uint8 digit bank -> device float32 in [-0.5, 0.5] (the transform
    chain's ToFloat + Normalize used by the MNIST configs)."""
    return jnp.asarray(bank, jnp.float32) / 255.0 - 0.5


def compose_frames(
    bank: jax.Array,  # (N, 28, 28) normalized
    digit: jax.Array,  # (M,) bank indices
    ys: jax.Array,  # (M,) integer top coordinates
    xs: jax.Array,  # (M,) integer left coordinates
) -> jax.Array:
    """Render M independent frames on device -> (M, 64, 64, 1) float32.

    Single-digit paste at the integer track position == render_video's
    max-composite for one digit (background is the normalized zero level).
    """
    background = jnp.full((IMAGE_SIZE, IMAGE_SIZE), -0.5, bank.dtype)

    def one(d, y, x):
        return jax.lax.dynamic_update_slice(background, bank[d], (y, x))

    frames = jax.vmap(one)(digit, ys, xs)
    return frames[..., None]


def compose_clip(
    bank: jax.Array,
    digit: jax.Array,  # scalar bank index
    ys: jax.Array,  # (SEQ_LENGTH,)
    xs: jax.Array,  # (SEQ_LENGTH,)
    pos: jax.Array,  # (L,) frame indices into the stored trajectory
) -> jax.Array:
    """One speed-subsampled clip -> (L, 64, 64, 1)."""
    length = pos.shape[0]
    return compose_frames(
        bank, jnp.broadcast_to(digit, (length,)), ys[pos], xs[pos]
    )


def compose_frames_cater(
    bank: jax.Array,  # (K, 32, 32, 4) float sprites, alpha in [..., 3]
    background: jax.Array,  # (128, 128, 3) float
    sid: jax.Array,  # (M, S) int32 sprite ids, painter's order
    top: jax.Array,  # (M, S) int32
    left: jax.Array,  # (M, S) int32
) -> jax.Array:
    """Render M synthetic-CATER frames on device -> (M, 128, 128, 3).

    Sequential alpha-masked paste per slot (dynamic_slice the patch, blend
    where alpha > 0, dynamic_update_slice back) — the device twin of
    generators/cater_synthetic.render_frame, bit-identical on uint8-scaled
    inputs (tested in tests/test_cater_synthetic.py)."""
    S = sid.shape[-1]
    sp = bank.shape[1]

    def one(sid_row, top_row, left_row):
        def paste(img, s):
            spr = bank[sid_row[s]]
            y, x = top_row[s], left_row[s]
            patch = jax.lax.dynamic_slice(img, (y, x, 0), (sp, sp, 3))
            blended = jnp.where(spr[..., 3:4] > 0, spr[..., :3], patch)
            return jax.lax.dynamic_update_slice(img, blended, (y, x, 0))

        img = background
        for s in range(S):  # S is small (4): unrolled pastes
            img = paste(img, s)
        return img

    return jax.vmap(one)(sid, top, left)


def _count_thresholds(seq_length: int) -> np.ndarray:
    """Largest float32 speed for which round(seq/interval) >= k, for
    k = seq//2+1 .. seq (interval = 1 + speed, sample_speed [1, 2]).

    count >= k  <=>  seq/(1+s) >= k - 0.5  <=>  s <= (2*seq - (2k-1))/(2k-1).
    The rational threshold is computed in float64 and rounded *down* to
    float32 so the traced comparison ``s <= t`` is exact for every float32
    s (ties at exactly k-0.5 are unreachable: the rational thresholds have
    odd denominators, hence are never float32 values).
    """
    ks = np.arange(seq_length // 2 + 1, seq_length + 1)
    exact = (2.0 * seq_length - (2 * ks - 1)) / (2 * ks - 1)
    t = exact.astype(np.float32)
    bad = t.astype(np.float64) > exact
    t[bad] = np.nextafter(t[bad], np.float32(-np.inf))
    return t


def clip_indices(
    speed: jax.Array, frames_length: int = 16, seq_length: int = SEQ_LENGTH
) -> jax.Array:
    """speed in [0, 1) -> (frames_length,) int32 stored-frame indices.

    Jit-safe exact replica of ``speed_subsample_indices(seq_length,
    [1.0, 2.0], speed, 1.0)`` truncated to ``frames_length`` and padded by
    repeating the last picked frame (reference dataload.py:246-258):

    - interval = 1 + speed, count = round_half_even(seq_length / interval),
      computed by comparing speed against precomputed exact thresholds;
    - index_i = floor(linspace(0, seq-1, count))_i == (i*(seq-1)) // (count-1)
      in integer math (denominators <= seq-1 make the float64 linspace and
      the rational floor provably agree).
    """
    thresholds = jnp.asarray(_count_thresholds(seq_length))
    count = seq_length // 2 + jnp.sum(
        (speed.astype(jnp.float32) <= thresholds).astype(jnp.int32)
    )
    i = jnp.minimum(jnp.arange(frames_length, dtype=jnp.int32), count - 1)
    return (i * (seq_length - 1)) // jnp.maximum(count - 1, 1)
