"""End-to-end Modified Double Moving MNIST training on one TPU chip.

BASELINE.json config 3: two digits with per-digit stop-at-wall vs bounce
physics, compositional two-clause captions, and a random static distractor
digit (reference data/mnist_caption_double_modified.py:74-192) — the
hardest dataset buildable offline and the first real test of the text
encoder beyond single-clause captions.

Same resident-data strategy as train_mnist_e2e.py (the tunneled chip moves
~0.5 MB/s host<->device): upload the compact dataset (digit bank + integer
trajectories + caption tokens), compose frames on device, train stage 1
(VQ-VAE f4) -> materialize per-frame latent ids -> train stage 2 (MAGE,
discrete) -> evaluate AR generation PSNR + per-digit motion correctness
(template-tracking the two captioned digits through the generated video
against their ground-truth trajectories).

The training loops live in mage_tpu/training/e2e.py (shared by all five
e2e chains); this driver supplies the dataset-specific pieces.

Usage (real chip):
    python train_mnist2_e2e.py --out runs/mnist2_e2e --bf16
Smoke (CPU):
    python train_mnist2_e2e.py --tiny --out /tmp/e2e2_smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data import device_data as dd
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training import e2e
from mage_tpu.training import vqvae_trainer as vt
from mage_tpu.training.checkpoint import Checkpointer

T_STORED = dd.SEQ_LENGTH + 1  # 21 stored frames (edge-padded tracks)
log_metrics = e2e.log_metrics
mse_to_psnr = e2e.mse_to_psnr


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/mnist2_e2e")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mnist-npz", default=None)
    p.add_argument("--num-train", type=int, default=24000)
    p.add_argument("--num-val", type=int, default=6000)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--codebook", type=int, default=512)
    p.add_argument("--stage1-epochs", type=int, default=100)
    p.add_argument("--batch1", type=int, default=128)
    p.add_argument("--lr1", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=2.0)
    p.add_argument("--config", default="config/mage_mnist.yaml")
    p.add_argument("--stage2-epochs", type=int, default=60)
    p.add_argument("--batch2", type=int, default=16)
    p.add_argument("--lr2", type=float, default=5e-5)
    p.add_argument("--frames-length", type=int, default=16)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--skip-stage1", action="store_true")
    p.add_argument("--skip-stage2", action="store_true")
    p.add_argument("--eval-only", action="store_true",
                   help="restore <out>/{vqvae,mage}/<--eval-ckpt> and run "
                        "the generation evals only")
    p.add_argument("--resume", action="store_true",
                   help="legacy: warm-restart stage 2 from a params-only "
                        "'final' checkpoint at --resume-epoch (stage 2 now "
                        "AUTO-resumes from <out>/mage/last when it exists)")
    p.add_argument("--resume-epoch", type=int, default=0,
                   help="with --resume when only a params-only 'final' "
                        "checkpoint exists: the epoch that run had reached")
    p.add_argument("--eval-ckpt", default="final")
    p.add_argument("--eval-videos", type=int, default=64)
    p.add_argument("--gifs", type=int, default=6)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--motion-loss-weight", type=float, default=0.0,
                   help="opt-in motion-weighted recon loss (MAGECore."
                        "motion_loss_weight): upweights tokens whose ids "
                        "change between frames; counters the copy-frame "
                        "hedge on stop-at-wall data (0 = reference-exact)")
    p.add_argument("--early-loss-weight", type=float, default=0.0,
                   help="opt-in early-frame loss upweighting "
                        "(MAGECore.early_loss_weight; 0 = reference-exact)")
    p.add_argument("--early-loss-frames", type=int, default=3)
    p.add_argument("--codebook-restart", action="store_true",
                   help="re-seed dead codebook entries every other epoch "
                        "from encoder features (the CATER stage-1 fix that "
                        "lifted 37->391 codes; the mnist2 flagship stage-1 "
                        "uses 7/512 codes and its recon ceilings bound every "
                        "downstream metric; off = reference parity)")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def frames_at(dev, split, idx, t):
    """Compose frames (len(idx),) x stored-frame t on device."""
    d = dev[split]
    return dd.compose_frames_double(
        dev["bank"], d["d1"][idx], d["ys1"][idx, t], d["xs1"][idx, t],
        d["d2"][idx], d["ys2"][idx, t], d["xs2"][idx, t],
        d["bg"][idx], d["bg_y"][idx], d["bg_x"][idx], d["has_bg"][idx],
    )


def clip_pixels(dev, split, i, pos):
    """One speed-subsampled GT clip (L, 64, 64, 1) on device."""
    d = dev[split]
    ln = pos.shape[0]
    return dd.compose_frames_double(
        dev["bank"],
        jnp.broadcast_to(d["d1"][i], (ln,)), d["ys1"][i, pos], d["xs1"][i, pos],
        jnp.broadcast_to(d["d2"][i], (ln,)), d["ys2"][i, pos], d["xs2"][i, pos],
        jnp.broadcast_to(d["bg"][i], (ln,)),
        jnp.broadcast_to(d["bg_y"][i], (ln,)),
        jnp.broadcast_to(d["bg_x"][i], (ln,)),
        jnp.broadcast_to(d["has_bg"][i], (ln,)),
    )


# ---------------------------------------------------------------------------
# Stage 1 / latents / stage 2: shared loops (mage_tpu/training/e2e.py)
# ---------------------------------------------------------------------------


def stage1(args, dev, out_dir):
    model = VectorQuantizedVAE(
        input_dim=1, down_ratio=4, dim=args.dim, K=args.codebook
    )
    state = e2e.run_vqvae_stage1(
        args, model,
        frames_at=lambda split, idx, t: frames_at(dev, split, idx, t),
        t_store=T_STORED,
        n_train=int(dev["train"]["d1"].shape[0]),
        n_val=int(dev["val"]["d1"].shape[0]),
        input_shape=(64, 64, 1),
        out_dir=out_dir,
        eval_cap=512,
        ssim_count=args.eval_videos,
        data_range=1.0,
    )
    return model, state


def materialize_latents(args, model, state, dev, split):
    """Encode all 21 stored frames of every clip -> ids (N, 21, h, w)."""
    n = int(dev[split]["d1"].shape[0])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def encode_chunk(idx):
        c = idx.shape[0]
        flat_idx = jnp.repeat(idx, T_STORED)
        t = jnp.tile(jnp.arange(T_STORED), c)
        frames = frames_at(dev, split, flat_idx, t)
        ids = model.apply(variables, frames, method="encode", mutable=False)
        return ids.reshape(c, T_STORED, *ids.shape[1:]).astype(jnp.int32)

    return e2e.materialize(n, 50, encode_chunk)


def build_pipeline(args, fs_variables):
    from mage_tpu.config import load_config

    cfg = load_config(args.config)
    cfg.model.params.first_stage_config.params.pop("ckpt_path", None)
    cfg.model.params.first_stage_config.params.dim = args.dim
    cfg.model.params.first_stage_config.params.K = args.codebook
    cfg.model.params.codebook_size = args.codebook
    cfg.model.params.frames_length = args.frames_length
    cfg.model.params.generate_decoder_config.params.frames_length = args.frames_length
    cfg.model.params.generate_decoder_config.params.out_channels = args.codebook
    if args.motion_loss_weight:
        cfg.model.params.motion_loss_weight = args.motion_loss_weight
    if args.early_loss_weight:
        cfg.model.params.early_loss_weight = args.early_loss_weight
        cfg.model.params.early_loss_frames = args.early_loss_frames
    if args.tiny:
        cfg.model.params.vision_width = 64
        cfg.model.params.text_encoder_config.params.transformer_width = 64
        cfg.model.params.text_encoder_config.params.output_dim = 64
        cfg.model.params.text_encoder_config.params.transformer_layers = 1
        cfg.model.params.ma_config.params.d_model = 64
        for k, v in dict(in_channels=64, model_channels=64, layers=3).items():
            cfg.model.params.generate_decoder_config.params[k] = v
    from mage_tpu.models.pipeline import MagePipeline

    return MagePipeline(first_stage_variables=fs_variables,
                        **cfg.model.params.to_dict())


def stage2(args, pipeline, dev, ids_train, ids_val, out_dir):
    b = args.batch2
    n = int(ids_train.shape[0])
    n_val = int(ids_val.shape[0])
    eval_b = min(64, n_val)
    len_train = dev["train"]["length"]
    len_val = dev["val"]["length"]

    def batch_at(rng, ids, text):
        k1, k2 = jax.random.split(rng)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(
            lambda s, ln: dd.clip_indices_var(s, ln, args.frames_length)
        )(speed, len_train[idx])
        lat = ids[idx[:, None], pos]
        return {"latents": lat, "text": text[idx], "speed": speed}

    def val_batch_at(rng, ids, text):
        k1, k2, k3 = jax.random.split(rng, 3)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(
            lambda s, ln: dd.clip_indices_var(s, ln, args.frames_length)
        )(speed, len_val[idx])
        batch = {"latents": ids[idx[:, None], pos], "text": text[idx],
                 "speed": speed}
        return batch, k3

    return e2e.run_mage_stage2(
        args, pipeline,
        batch_at=batch_at, val_batch_at=val_batch_at,
        lat_train=ids_train, lat_val=ids_val,
        text_train=dev["train"]["text"], text_val=dev["val"]["text"],
        out_dir=out_dir,
        latent_shape=ids_train.shape[2:], latent_dtype=jnp.int32,
        last_every=5,  # this chain checkpoints full state on every eval
        legacy_resume_epoch=args.resume_epoch if args.resume else None,
    )


# ---------------------------------------------------------------------------
# Evaluation: generation PSNR + per-digit motion correctness
# ---------------------------------------------------------------------------


def track_digit(video: np.ndarray, template: np.ndarray) -> np.ndarray:
    """Template-match one digit through a (L, 64, 64) video -> (L, 2) int
    (y, x) positions. Zero-mean cross-correlation (a plain matched filter
    via einsum over strided windows) over all 37x37 valid placements; the
    exact digit instance is known, so matched filtering is reliable even
    with a same-looking distractor nearby."""
    from numpy.lib.stride_tricks import sliding_window_view

    tm = template - template.mean()
    L = video.shape[0]
    pos = np.zeros((L, 2), np.int32)
    for t in range(L):
        frame = video[t]
        # stride the frame into (37, 37, 28, 28) windows without copying
        wins = sliding_window_view(frame, (dd.DIGIT_SIZE, dd.DIGIT_SIZE))
        score = np.einsum("yxhw,hw->yx", wins, tm, optimize=True)
        iy, ix = np.unravel_index(np.argmax(score), score.shape)
        pos[t] = (iy, ix)
    return pos


def motion_metrics(gen: np.ndarray, dev_host: dict, bank: np.ndarray,
                   idx: np.ndarray, pos_all: np.ndarray) -> dict:
    """Per-digit motion correctness of generated videos vs ground truth.

    gen: (G, L-1, 64, 64) generated frames 1..L-1 in [-0.5, 0.5].
    For each captioned digit: template-track it through the generated
    video, compare to the GT trajectory at the same subsampled positions.
    Reports mean per-frame position error (px), the fraction of digit
    tracks within 5 px mean error ("motion correct"), and initial-direction
    accuracy (sign of the first GT-significant displacement)."""
    errs, correct, dir_ok, n_dir = [], 0, 0, 0
    g = gen.shape[0]
    for i in range(g):
        ci = int(idx[i])
        pos = pos_all[i]  # (L,) stored-frame indices
        for dkey, ykey, xkey in (("d1", "ys1", "xs1"), ("d2", "ys2", "xs2")):
            tmpl = bank[dev_host[dkey][ci]]
            gt = np.stack([dev_host[ykey][ci, pos], dev_host[xkey][ci, pos]], -1)
            tr = track_digit(gen[i], tmpl)  # frames 1..L-1
            err = np.abs(tr - gt[1:]).mean()
            errs.append(err)
            correct += int(err <= 5.0)
            # initial direction along the GT-moving axis
            d_gt = gt[1:] - gt[0]
            first = np.argmax(np.abs(d_gt).max(1) > 2)  # first real move
            ax = int(np.abs(d_gt[first]).argmax())
            if abs(d_gt[first][ax]) > 2:
                n_dir += 1
                d_tr = tr[first] - gt[0]
                dir_ok += int(np.sign(d_tr[ax]) == np.sign(d_gt[first][ax]))
    n = len(errs)
    return {
        "digit_tracks": n,
        "mean_track_error_px": float(np.mean(errs)),
        "motion_correct_frac": correct / n,
        "initial_direction_acc": dir_ok / max(n_dir, 1),
        "direction_cases": n_dir,
    }


def eval_generation(args, pipeline, params, dev, ids, split, out_dir):
    d = dev[split]
    g = min(args.eval_videos, int(ids.shape[0]))
    text = d["text"][:g]
    speed = jnp.full((g,), 0.5, jnp.float32)
    pos = jax.vmap(
        lambda s, ln: dd.clip_indices_var(s, ln, args.frames_length)
    )(speed, d["length"][:g])
    fs_vars = pipeline.first_stage.variables

    # the full train-split ids array (24000 clips, ~0.5 GB) is too big to
    # ride as a closure constant through the remote AOT compile (HTTP 413);
    # slice to the evaluated g on device and pass as a jit ARGUMENT
    ids_g = ids[:g]

    @jax.jit
    def run(params, ids_g):
        lat0 = ids_g[:, :1]
        gen = pipeline.core.apply(
            {"params": params}, lat0, text, speed, method="generate_cached",
            rngs={"latent": jax.random.PRNGKey(7)},
        )
        video = pipeline.first_stage.decode(gen, variables=fs_vars)
        # flat single-level composition: vmapping clip_pixels over the clip
        # index nests a second vmap around compose_frames_double's internal
        # one, which XLA miscompiles (see tests/test_device_data.py
        # nested-vmap regression). Matches materialize_latents' call shape.
        L = pos.shape[1]
        gt_flat = frames_at(dev, split, jnp.repeat(jnp.arange(g), L),
                            pos.reshape(-1))
        gt = gt_flat.reshape(g, L, *gt_flat.shape[1:])
        recon_gt = pipeline.first_stage.decode(
            ids_g[jnp.arange(g)[:, None], pos], variables=fs_vars
        )
        mse_gen = jnp.mean((video - gt[:, 1:]) ** 2)
        mse_recon = jnp.mean((recon_gt[:, 1:] - gt[:, 1:]) ** 2)
        return video, gt, recon_gt, mse_gen, mse_recon

    video, gt, recon_gt, mse_gen, mse_recon = run(params, ids_g)
    mse_gen = float(jax.device_get(mse_gen))
    mse_recon = float(jax.device_get(mse_recon))

    gen_np = np.asarray(jax.device_get(video))[..., 0]
    recon_np = np.asarray(jax.device_get(recon_gt))[:, 1:, ..., 0]
    dev_host = {k: np.asarray(jax.device_get(v))
                for k, v in d.items() if k != "text"}
    bank_np = np.asarray(jax.device_get(dev["bank"]))
    pos_np = np.asarray(jax.device_get(pos))
    mm = motion_metrics(gen_np, dev_host, bank_np, np.arange(g), pos_np)
    # tracking ceiling: the same metric on first-stage RECONSTRUCTIONS of
    # the GT latents — separates "generator doesn't follow the caption"
    # from "tracker can't follow decoded pixels"
    mm_ceil = motion_metrics(recon_np, dev_host, bank_np, np.arange(g),
                             pos_np)
    log_metrics(out_dir, {
        "phase": f"generation_{split}", "samples": g,
        "gen_psnr_vs_gt": mse_to_psnr(mse_gen),
        "recon_psnr_vs_gt_upper_bound": mse_to_psnr(mse_recon),
        **mm,
        "recon_motion_correct_ceiling": mm_ceil["motion_correct_frac"],
        "recon_track_error_px_ceiling": mm_ceil["mean_track_error_px"],
        "recon_direction_acc_ceiling": mm_ceil["initial_direction_acc"],
    })

    def to_rgb(v):  # [-0.5, 0.5] grayscale -> [-1, 1] rgb
        return np.repeat(2.0 * np.clip(v + 0.5, 0, 1) - 1.0, 3, axis=-1)

    gt_np = np.asarray(jax.device_get(gt))[:, 1:]
    e2e.log_fvd(out_dir, split, "MovingMNIST",
                to_rgb(gt_np),
                to_rgb(np.asarray(jax.device_get(video))),
                to_rgb(np.asarray(jax.device_get(recon_gt))[:, 1:]),
                batch_size=8)

    e2e.write_side_gifs(out_dir, split, np.asarray(jax.device_get(gt)),
                        np.asarray(jax.device_get(video)), args.gifs,
                        scale=2.0)
    return mse_gen


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        args.num_train, args.num_val = 64, 16
        args.dim, args.codebook = 16, 32
        args.stage1_epochs = 2
        if args.stage2_epochs == 60:  # keep an explicit value (resume smokes)
            args.stage2_epochs = 2
        args.batch1, args.batch2, args.chunk = 8, 4, 2
        args.eval_videos, args.gifs = 4, 1
    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}")

    compact = dd.build_compact_double_modified(
        args.num_train, args.num_val, args.seed, args.mnist_npz
    )
    dev = {
        "bank": dd.normalize_bank(compact["bank"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
    }
    print(f"resident dataset: {compact['bank'].nbytes/1e6:.1f} MB bank, "
          f"{args.num_train} train / {args.num_val} val clips")

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=args.dim, K=args.codebook)
    if args.skip_stage1 or args.eval_only:
        tx = vt.make_tx(args.lr1)
        state = vt.create_state(model, jax.random.PRNGKey(args.seed),
                                jnp.zeros((1, 64, 64, 1)), tx)
        state = Checkpointer(os.path.join(args.out, "vqvae")).restore("best", state)
        state = jax.device_put(state)
    else:
        model, state = stage1(args, dev, args.out)

    fs_variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.skip_stage2 and not args.eval_only:
        return
    t0 = time.time()
    ids_train = materialize_latents(args, model, state, dev, "train")
    ids_val = materialize_latents(args, model, state, dev, "val")
    ids_train.block_until_ready()
    log_metrics(args.out, {"phase": "latents", "train_shape": list(ids_train.shape),
                           "sec": time.time() - t0})

    pipeline = build_pipeline(args, fs_variables)
    if args.eval_only:
        params = e2e.init_stage2_params(pipeline, args.seed,
                                        args.frames_length,
                                        ids_train.shape[2:], jnp.int32)
        restored = Checkpointer(os.path.join(args.out, "mage")).restore(
            args.eval_ckpt, {"step": jnp.zeros((), jnp.int32),
                             "params": jax.device_get(params)})
        params = jax.device_put(restored["params"])
    else:
        params = stage2(args, pipeline, dev, ids_train, ids_val, args.out)
    eval_generation(args, pipeline, params, dev, ids_val, "val", args.out)
    eval_generation(args, pipeline, params, dev, ids_train, "train", args.out)


if __name__ == "__main__":
    main()
