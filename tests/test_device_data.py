"""On-device data pipeline parity: the compact generator must describe the
exact dataset the record-store generator writes (same seed), on-device
frame composition must match mnist_common.render_video, and the jax
speed-subsample indices must match datasets.speed_subsample_indices +
repeat-last padding for every reachable speed."""

import numpy as np
import jax.numpy as jnp

from mage_tpu.data import device_data as dd
from mage_tpu.data.datasets import MovingMnist, speed_subsample_indices
from mage_tpu.data.generators import mnist_common as mc
from mage_tpu.data.generators import mnist_single


def test_compact_matches_record_generator():
    """Same seed -> the compact arrays render to the exact records the
    .mrs generator writes (videos byte-identical, captions identical)."""
    rng = np.random.RandomState(7)
    images, labels = mc.load_digit_bank(None, samples_per_digit=5, seed=7)
    train_codes, _ = mc.digit_motion_split(rng)
    records = mnist_single.generate_split(rng, train_codes, images, labels, 6)

    compact = _compact_replay(seed=7, num=6, samples_per_digit=5)
    bank = compact["bank"]
    tok_text = compact["train"]["text"]

    ds_tok = MovingMnist.__new__(MovingMnist)  # only need the tokenizer
    from mage_tpu.data.tokenizers import MNIST_VOCAB, VocabTokenizer

    tokenizer = VocabTokenizer(MNIST_VOCAB, split_mode="whitespace")

    for i, (video, caption) in enumerate(records):
        d = compact["train"]["digit"][i]
        ys, xs = compact["train"]["ys"][i], compact["train"]["xs"][i]
        rendered = mc.render_video([bank[d]], [(ys, xs)], dd.SEQ_LENGTH)
        np.testing.assert_array_equal(rendered, video)
        np.testing.assert_array_equal(
            tok_text[i], tokenizer.encode_padded(caption, 32)
        )


def _compact_replay(seed, num, samples_per_digit):
    """build_compact_single_mnist with a small procedural bank (test-size)."""
    rng = np.random.RandomState(seed)
    images, labels = mc.load_digit_bank(None, samples_per_digit=samples_per_digit, seed=seed)
    train_codes, val_codes = mc.digit_motion_split(rng)
    from mage_tpu.data.tokenizers import MNIST_VOCAB, VocabTokenizer

    tokenizer = VocabTokenizer(MNIST_VOCAB, split_mode="whitespace")
    digits, motions = train_codes % 10, train_codes // 10
    idx, ys, xs, text = [], [], [], []
    while len(idx) < num:
        i = rng.randint(images.shape[0])
        label = int(labels[i])
        matches = np.where(digits == label)[0]
        if len(matches) == 0:
            continue
        motion = int(motions[rng.choice(matches)])
        direction = int(rng.randint(0, 2))
        ty, tx = mc.bounce_trajectory(dd.SEQ_LENGTH, rng, motion, direction)
        caption = "the digit %d is moving %s ." % (
            label, mc.MOTION_STRINGS[motion + 2 * direction]
        )
        idx.append(i)
        ys.append(ty)
        xs.append(tx)
        text.append(tokenizer.encode_padded(caption, 32))
    return {
        "bank": images,
        "train": {
            "digit": np.asarray(idx, np.int32),
            "ys": np.stack(ys).astype(np.int32),
            "xs": np.stack(xs).astype(np.int32),
            "text": np.stack(text).astype(np.int32),
        },
    }


def test_build_compact_rng_parity():
    """build_compact_single_mnist follows the generator's RNG sequence."""
    c1 = dd.build_compact_single_mnist(num_train=4, num_val=3, seed=11)
    c2 = _compact_replay(seed=11, num=4, samples_per_digit=100)
    np.testing.assert_array_equal(c1["train"]["digit"], c2["train"]["digit"])
    np.testing.assert_array_equal(c1["train"]["ys"], c2["train"]["ys"])
    np.testing.assert_array_equal(c1["train"]["text"], c2["train"]["text"])


def test_compose_frames_matches_render_video():
    compact = dd.build_compact_single_mnist(num_train=5, num_val=2, seed=3)
    bank_j = dd.normalize_bank(compact["bank"])
    tr = compact["train"]
    for i in range(5):
        rendered = mc.render_video(
            [compact["bank"][tr["digit"][i]]],
            [(tr["ys"][i], tr["xs"][i])],
            dd.SEQ_LENGTH,
        ).astype(np.float32) / 255.0 - 0.5
        composed = dd.compose_frames(
            bank_j,
            jnp.full((dd.SEQ_LENGTH,), tr["digit"][i]),
            jnp.asarray(tr["ys"][i]),
            jnp.asarray(tr["xs"][i]),
        )
        np.testing.assert_allclose(
            np.asarray(composed)[..., 0], rendered, atol=1e-7
        )


def test_clip_indices_matches_dataset_sampling():
    """jax clip_indices == speed_subsample_indices + truncate + repeat-pad
    for a dense sweep of speeds (the full reachable count range)."""
    L = 16
    for speed in np.concatenate(
        [np.linspace(0.0, 0.999, 997), np.random.RandomState(0).rand(1000)]
    ):
        ref = speed_subsample_indices(dd.SEQ_LENGTH, [1.0, 2.0], float(np.float32(speed)), 1.0)
        ref = ref[:L]
        if len(ref) < L:
            ref = np.concatenate([ref, np.repeat(ref[-1:], L - len(ref))])
        ours = np.asarray(dd.clip_indices(jnp.float32(speed), frames_length=L))
        np.testing.assert_array_equal(ours, ref, err_msg=f"speed={speed}")


def test_latent_gather_equals_pixel_subsample_then_encode():
    """Encoding all stored frames then gathering latent frames by
    clip_indices == subsampling pixels then encoding (encode is per-frame).
    Uses a tiny random VQ-VAE."""
    import jax
    from mage_tpu.models.vqvae import VectorQuantizedVAE

    compact = dd.build_compact_single_mnist(num_train=2, num_val=1, seed=5)
    bank_j = dd.normalize_bank(compact["bank"])
    tr = compact["train"]
    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=8, K=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), train=True)

    i = 0
    frames = dd.compose_frames(
        bank_j,
        jnp.full((dd.SEQ_LENGTH,), tr["digit"][i]),
        jnp.asarray(tr["ys"][i]),
        jnp.asarray(tr["xs"][i]),
    )  # (20, 64, 64, 1)
    all_ids = model.apply(variables, frames, method="encode", mutable=False)
    pos = dd.clip_indices(jnp.float32(0.63))
    gathered = np.asarray(all_ids[pos])

    direct = np.asarray(
        model.apply(variables, frames[pos], method="encode", mutable=False)
    )
    np.testing.assert_array_equal(gathered, direct)


def test_compact_double_modified_matches_record_generator():
    """Same seed + bank -> the compact double-modified arrays render to the
    exact records mnist_double_modified.generate_split produces (videos
    byte-identical through the true length, captions identical), and the
    device composite matches through the edge-padded tail."""
    import jax

    from mage_tpu.data.generators import mnist_double, mnist_double_modified

    images, labels = mc.load_digit_bank(None, samples_per_digit=5, seed=11)
    rng = np.random.RandomState(11)
    train_codes, val_codes = mnist_double.pair_motion_split(rng)
    n_train, n_val = 6, 3
    recs_train = mnist_double_modified.generate_split(
        rng, train_codes, images, labels, n_train
    )
    recs_val = mnist_double_modified.generate_split(
        rng, val_codes, images, labels, n_val
    )

    compact = dd.build_compact_double_modified(
        n_train, n_val, seed=11, bank=(images, labels)
    )
    from mage_tpu.data.tokenizers import MNIST_VOCAB, VocabTokenizer

    tokenizer = VocabTokenizer(MNIST_VOCAB, split_mode="whitespace")
    bank_dev = dd.normalize_bank(images)

    for split, recs in (("train", recs_train), ("val", recs_val)):
        c = compact[split]
        for i, (video, caption) in enumerate(recs):
            tlen = int(c["length"][i])
            assert video.shape[0] == tlen
            np.testing.assert_array_equal(
                c["text"][i], tokenizer.encode_padded(caption, 32)
            )
            # host render from compact tracks == generator video
            rendered = mc.render_video(
                [images[c["d1"][i]], images[c["d2"][i]]],
                [(c["ys1"][i], c["xs1"][i]), (c["ys2"][i], c["xs2"][i])],
                tlen,
                static_overlays=(
                    [(images[c["bg"][i]], int(c["bg_y"][i]), int(c["bg_x"][i]))]
                    if c["has_bg"][i] else None
                ),
            )
            np.testing.assert_array_equal(rendered, video)
            # device composite (all 21 padded frames) matches the
            # normalized video through tlen
            t = np.arange(dd.SEQ_LENGTH + 1)
            frames = dd.compose_frames_double(
                bank_dev,
                jnp.full(t.shape, c["d1"][i]), jnp.asarray(c["ys1"][i]),
                jnp.asarray(c["xs1"][i]),
                jnp.full(t.shape, c["d2"][i]), jnp.asarray(c["ys2"][i]),
                jnp.asarray(c["xs2"][i]),
                jnp.full(t.shape, c["bg"][i]), jnp.full(t.shape, c["bg_y"][i]),
                jnp.full(t.shape, c["bg_x"][i]), jnp.full(t.shape, c["has_bg"][i]),
            )
            np.testing.assert_allclose(
                np.asarray(frames)[:tlen, ..., 0],
                video.astype(np.float32) / 255.0 - 0.5,
                atol=1e-6,
            )


def test_clip_indices_var_matches_dataset_sampling():
    """clip_indices_var == speed_subsample_indices + repeat-last padding
    for variable clip lengths (the modified-double regime)."""
    import jax

    rng = np.random.RandomState(0)
    for _ in range(200):
        length = int(rng.randint(6, 22))
        speed = np.float32(rng.rand())
        ref = speed_subsample_indices(length, [1.0, 2.0], float(speed), 1.0)
        ref = ref[:16]
        ref = np.pad(ref, (0, 16 - len(ref)), mode="edge")
        got = np.asarray(
            dd.clip_indices_var(jnp.float32(speed), jnp.int32(length), 16)
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"{length} {speed}")


# ---------------------------------------------------------------------------
# Nested-vmap gather+compose regression (round 4).
#
# XLA:TPU miscompiles  jit(vmap(i -> compose(table[i, pos_i], ...)))  — an
# outer vmap over the clip index wrapped around a compose_frames* (which
# carries its own internal vmap over frames) with the per-clip table gather
# fused into the same jit program. The output frames get wrong sprites /
# alpha-box artifacts (max pixel error ~0.92 on CATER shapes, at table
# sizes as small as 12 clips). The CPU backend is CLEAN — early "CPU
# repros" were silently running on the axon TPU backend (in-script
# JAX_PLATFORMS=cpu is too late: sitecustomize imports jax at interpreter
# start; only shell-level env or jax.config.update works). Un-jitted
# loops, pre-gathered tables, and the FLAT single-level form are bit-exact
# vs numpy on BOTH backends.
#
# Every eval/probe GT-composition site therefore uses the flat form:
#   frames_at(repeat(arange(G), L), pos.reshape(-1)).reshape(G, L, ...)
# These CPU tests pin the flat form's exactness against the un-jitted
# per-clip loop; the on-chip twin of the nested-vs-flat check lives in
# scripts/kernel_smoke.py (case nested_vmap_compose), where the bug
# actually fires.
# ---------------------------------------------------------------------------


def _cater_tables(n_val=12):
    import mage_tpu.data.generators.cater_synthetic as cs

    compact = cs.build_compact_cater(2, n_val, 0, dataset="CATER-GEN-v2",
                                     context_length=38)
    norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0  # noqa: E731
    bank = jnp.concatenate(
        [norm(compact["bank"][..., :3]),
         jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1)
    background = norm(compact["background"])
    d = {k: jnp.asarray(v) for k, v in compact["val"].items() if k != "meta"}

    def frames_at(idx, t):
        return dd.compose_frames_cater(bank, background,
                                       d["sid"][idx, t], d["top"][idx, t],
                                       d["left"][idx, t])

    G, L, T = 8, 10, d["sid"].shape[1]
    i10 = jnp.arange(L, dtype=jnp.int32)
    pos = jnp.stack([jnp.clip((i10 * (T - 1)) // (L - 1) + k % 3, 0, T - 1)
                     for k in range(G)])
    ref = np.stack([np.asarray(frames_at(jnp.full((L,), k), pos[k]))
                    for k in range(G)])
    return frames_at, pos, ref, (G, L)


def test_eval_gt_flat_composition_is_exact_cater():
    """The flat single-level GT composition used by every eval — gather at
    concrete (clip, frame) index pairs, one compose_frames_cater call — is
    bit-exact vs the un-jitted per-clip loop under jit."""
    import jax

    frames_at, pos, ref, (G, L) = _cater_tables()
    flat = jax.jit(
        lambda: frames_at(jnp.repeat(jnp.arange(G), L),
                          pos.reshape(-1)).reshape(G, L, *ref.shape[2:])
    )()
    np.testing.assert_array_equal(np.asarray(flat), ref)


def test_nested_vmap_gather_compose_clean_on_cpu():
    """The nested form that XLA:TPU miscompiles is exact on the CPU
    backend — pins that the corruption is TPU-specific (the on-chip canary
    is kernel_smoke.py case nested_vmap_compose). If this test ever fails,
    the miscompile has spread to CPU and every CPU-side GT/probe result
    needs re-auditing."""
    import jax

    frames_at, pos, ref, (G, L) = _cater_tables()
    nested = jax.jit(lambda: jax.vmap(
        lambda i: frames_at(jnp.broadcast_to(i, (L,)), pos[i])
    )(jnp.arange(G)))()
    np.testing.assert_array_equal(np.asarray(nested), ref)


def test_eval_gt_flat_composition_is_exact_mnist_single():
    """Flat form vs per-clip loop for the single-MNIST compose family
    (compose_frames / compose_clip)."""
    import jax

    compact = _compact_replay(seed=3, num=8, samples_per_digit=5)
    bank = dd.normalize_bank(compact["bank"])
    d = {k: jnp.asarray(v) for k, v in compact["train"].items()}
    G, L = 8, 10
    pos = jnp.stack([
        dd.clip_indices(jnp.float32(0.1 * k), frames_length=L)
        for k in range(G)
    ])
    ref = np.stack([
        np.asarray(dd.compose_clip(bank, d["digit"][k], d["ys"][k],
                                   d["xs"][k], pos[k]))
        for k in range(G)
    ])
    rows, cols = jnp.repeat(jnp.arange(G), L), pos.reshape(-1)
    flat = jax.jit(
        lambda: dd.compose_frames(
            bank, jnp.repeat(d["digit"][:G], L),
            d["ys"][rows, cols], d["xs"][rows, cols]
        ).reshape(G, L, *ref.shape[2:])
    )()
    np.testing.assert_array_equal(np.asarray(flat), ref)
