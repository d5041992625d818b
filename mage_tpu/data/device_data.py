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
