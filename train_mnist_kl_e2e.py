"""End-to-end MAGE+ (continuous KL first stage) on Single Moving MNIST.

The full continuous chain the reference only ships for CATER
(config/mage+_caterv2.yaml): train an AutoencoderKL (f4, 64px) -> train
the continuous stage-2 with the stochastic randomness branch and same-step
PID auto-beta -> evaluate generation with BOTH samplers (the naive
reference-parity O(L^2) loop, mage_model.py:641-693, and the causal-GN
O(L) cached sampler), prior-sample diversity, and FVD.

``--ambiguous`` mirrors the reference's CATER randomness recipe (the
annotation file swaps to ambiguous captions when randomness is on,
dataload.py:290-292): motion clauses become "here and there", so the
trajectory is genuinely under-determined and the stochastic branch is
*load-bearing* — prior samples must supply the direction. Evaluation then
reports best-of-K prior-sample PSNR, pairwise diversity, and the fraction
of samples whose motion matches some valid reading.

Resident-data strategy identical to train_mnist_e2e.py. Stage-2 latents:
the KL encoder's per-frame MOMENTS (mean, logvar) are materialized once
(deterministic), and every train step draws a fresh posterior sample from
them — exactly the reference's stochastic ``get_first_stage_encoding``
(mage_model.py:542-549) without re-running the encoder.

The training loops live in mage_tpu/training/e2e.py (shared by all five
e2e chains); this driver supplies the dataset/variant-specific pieces.

Usage (real chip):
    python train_mnist_kl_e2e.py --out runs/mnist_klp_e2e --ambiguous
Smoke (CPU):
    python train_mnist_kl_e2e.py --tiny --out /tmp/e2e_kl_smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data import device_data as dd
from mage_tpu.models.autoencoder_kl import AutoencoderKL, DiagonalGaussian
from mage_tpu.training import e2e
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.mage_trainer import cast_floating
from mage_tpu.utils.media import save_gif

log_metrics = e2e.log_metrics
mse_to_psnr = e2e.mse_to_psnr


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/mnist_klp_e2e")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mnist-npz", default=None)
    p.add_argument("--num-train", type=int, default=10000)
    p.add_argument("--num-val", type=int, default=2000)
    p.add_argument("--ambiguous", action="store_true",
                   help="strip motion clauses from captions (the CATER "
                        "randomness recipe): direction comes from the prior")
    # stage A: KL autoencoder (f4 at 64px; reference ddconfig shape at
    # config/mage+_caterv2.yaml:28-44 scaled to the MNIST resolution)
    p.add_argument("--ae-ch", type=int, default=64)
    p.add_argument("--ae-epochs", type=int, default=40)
    p.add_argument("--ae-batch", type=int, default=64)
    p.add_argument("--ae-lr", type=float, default=1e-4)
    p.add_argument("--ae-kl-weight", type=float, default=1e-6)
    p.add_argument("--ae-logvar-bias", type=float, default=0.0,
                   help="constant shift on the AE's predicted logvar "
                        "(-6 ~ the pretrained-ldm tight-posterior regime)")
    p.add_argument("--posterior-logvar-shift", type=float, default=0.0,
                   help="stage-2-only post-hoc logvar shift when sampling "
                        "targets from stored moments (reuse an "
                        "already-trained AE with quieter samples)")
    # stage 2
    p.add_argument("--config", default="config/mage+_mnist.yaml")
    p.add_argument("--stage2-epochs", type=int, default=50)
    p.add_argument("--batch2", type=int, default=16)
    p.add_argument("--lr2", type=float, default=5e-5)
    p.add_argument("--v-kl", type=float, default=10.0)
    p.add_argument("--frames-length", type=int, default=16)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--skip-ae", action="store_true")
    p.add_argument("--skip-stage2", action="store_true")
    p.add_argument("--eval-only", action="store_true",
                   help="restore <out>/mage/<--eval-ckpt> and run the "
                        "evaluation suite only")
    p.add_argument("--eval-ckpt", default="final")
    p.add_argument("--eval-videos", type=int, default=32)
    p.add_argument("--diversity-samples", type=int, default=8)
    p.add_argument("--gifs", type=int, default=4)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


def make_ambiguous_text(compact, seed, context_length=32):
    """Re-caption every clip as "the digit D is moving here and there ."
    (vocab-covered filler words, reference dataload.py:199-203) — the
    MNIST analogue of CATER's ambiguous annotation mode."""
    from mage_tpu.data.generators import mnist_common as mc
    from mage_tpu.data.tokenizers import MNIST_VOCAB, VocabTokenizer

    _, labels = mc.load_digit_bank(None, seed=seed)
    tok = VocabTokenizer(MNIST_VOCAB, split_mode="whitespace")
    for split in ("train", "val"):
        d = compact[split]
        text = np.stack([
            tok.encode_padded(
                "the digit %d is moving here and there ." % labels[i],
                context_length,
            )
            for i in d["digit"]
        ]).astype(np.int32)
        d["text"] = text
    return compact


def frames_at(dev, split, idx, t):
    """Compose frames (len(idx),) x stored-frame t on device."""
    d = dev[split]
    return dd.compose_frames(dev["bank"], d["digit"][idx],
                             d["ys"][idx, t], d["xs"][idx, t])


# ---------------------------------------------------------------------------
# Stage A / moments / stage 2: shared loops (mage_tpu/training/e2e.py)
# ---------------------------------------------------------------------------


def make_ae(args):
    return AutoencoderKL(
        embed_dim=4, ch=args.ae_ch, ch_mult=(1, 2, 4), num_res_blocks=2,
        in_channels=1, out_ch=1, z_channels=4, double_z=True, resolution=64,
        logvar_bias=args.ae_logvar_bias,
    )


def stage_ae(args, dev, out_dir):
    model = make_ae(args)
    params = e2e.run_klae_stage1(
        args, model,
        frames_at=lambda split, idx, t: frames_at(dev, split, idx, t),
        t_store=dd.SEQ_LENGTH,
        n_train=int(dev["train"]["digit"].shape[0]),
        n_val=int(dev["val"]["digit"].shape[0]),
        input_shape=(64, 64, 1),
        out_dir=out_dir,
        eval_cap=256,
        ssim_count=32,
        data_range=1.0,
    )
    return model, params


def materialize_moments(args, model, params, dev, split):
    """Encode every stored frame -> posterior moments (N, 20, 16, 16, 8)
    bf16 (mean, logvar). Deterministic; sampling happens per train step."""
    n = int(dev[split]["digit"].shape[0])

    @jax.jit
    def encode_chunk(idx):
        c = idx.shape[0]
        flat_idx = jnp.repeat(idx, dd.SEQ_LENGTH)
        t = jnp.tile(jnp.arange(dd.SEQ_LENGTH), c)
        frames = frames_at(dev, split, flat_idx, t)
        moments = model.apply({"params": params}, frames,
                              method="encode_moments")
        return moments.reshape(c, dd.SEQ_LENGTH, *moments.shape[1:]).astype(
            jnp.bfloat16
        )

    return e2e.materialize(n, 50, encode_chunk)


def build_pipeline(args, ae_model, ae_params):
    from mage_tpu.config import load_config
    from mage_tpu.models.pipeline import MagePipeline

    cfg = load_config(args.config)
    p = cfg.model.params
    p.first_stage_config.params.pop("ckpt_path", None)
    p.first_stage_config.params.ddconfig.ch = args.ae_ch
    p.frames_length = args.frames_length
    p.generate_decoder_config.params.frames_length = args.frames_length
    p.v_kl = args.v_kl
    if args.tiny:
        p.vision_width = 64
        p.text_encoder_config.params.transformer_width = 64
        p.text_encoder_config.params.output_dim = 64
        p.text_encoder_config.params.transformer_layers = 1
        p.ma_config.params.d_model = 64
        for k, v in dict(in_channels=64, model_channels=64, layers=3).items():
            p.generate_decoder_config.params[k] = v
    return MagePipeline(
        first_stage_variables={"params": ae_params}, **p.to_dict()
    )


def sample_latents(moments, rng, logvar_shift=0.0):
    """(..., 8) bf16 moments -> (..., 4) sampled latents (stochastic
    per-step targets, reference mage_model.py:542-549). ``logvar_shift``
    quiets the posterior post hoc (see --posterior-logvar-shift)."""
    mom = moments.astype(jnp.float32)
    if logvar_shift:
        mean, logvar = jnp.split(mom, 2, axis=-1)
        mom = jnp.concatenate([mean, logvar + logvar_shift], axis=-1)
    post = DiagonalGaussian(mom)
    return post.sample(rng).astype(jnp.bfloat16)


def stage2(args, pipeline, dev, mom_train, mom_val, out_dir):
    b = args.batch2
    n = int(mom_train.shape[0])
    n_val = int(mom_val.shape[0])
    eval_b = min(64, n_val)
    lv_shift = args.posterior_logvar_shift

    def batch_at(rng, mom, text):
        k1, k2, k3 = jax.random.split(rng, 3)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(lambda s: dd.clip_indices(
            s, frames_length=args.frames_length))(speed)
        lat = sample_latents(mom[idx[:, None], pos], k3, lv_shift)
        return {"latents": lat, "text": text[idx], "speed": speed}

    def val_batch_at(rng, mom, text):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(lambda s: dd.clip_indices(
            s, frames_length=args.frames_length))(speed)
        batch = {"latents": sample_latents(mom[idx[:, None], pos], k4,
                                           lv_shift),
                 "text": text[idx], "speed": speed}
        return batch, k3

    return e2e.run_mage_plus_stage2(
        args, pipeline,
        batch_at=batch_at, val_batch_at=val_batch_at,
        mom_train=mom_train, mom_val=mom_val,
        text_train=dev["train"]["text"], text_val=dev["val"]["text"],
        out_dir=out_dir,
    )


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def eval_generation(args, pipeline, params, dev, mom, split, out_dir):
    """Both samplers + prior-sample diversity + FVD on ``split``."""
    bank, d = dev["bank"], dev[split]
    g = min(args.eval_videos, int(mom.shape[0]))
    K = args.diversity_samples
    text = d["text"][:g]
    speed_f32 = jnp.full((g,), 0.5, jnp.float32)
    # subsample indices from f32 speed (exact threshold math), model input
    # in compute dtype (f32 speed would promote the anchor out of bf16 and
    # dtype-clash with the bf16 KV cache)
    pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=args.frames_length))(speed_f32)
    fs_vars = pipeline.first_stage.variables
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    speed = speed_f32.astype(compute_dtype) if compute_dtype else speed_f32
    p_use = cast_floating(params, compute_dtype) if compute_dtype else params
    # frame-0 latents: posterior MODE of the stored moments (eval determinism)
    lat0 = DiagonalGaussian(
        mom[:g, :1].astype(jnp.float32)
    ).mode()
    if compute_dtype:
        lat0 = lat0.astype(compute_dtype)

    def gt_pixels():
        # flat single-level composition: vmapping compose_clip over the
        # clip index nests a second vmap around compose_frames' internal
        # one, which XLA miscompiles (see tests/test_device_data.py
        # nested-vmap regression). Matches materialize_moments' call shape.
        L = pos.shape[1]
        rows = jnp.repeat(jnp.arange(g), L)
        cols = pos.reshape(-1)
        flat = dd.compose_frames(
            bank, jnp.repeat(d["digit"][:g], L),
            d["ys"][rows, cols], d["xs"][rows, cols])
        return flat.reshape(g, L, *flat.shape[1:])

    @jax.jit
    def run_both(p):
        gt = gt_pixels()
        out = {}
        for name, method in (("cached", "generate_cached"), ("naive", "generate")):
            lat = pipeline.core.apply(
                {"params": p}, lat0, text, speed, method=method,
                rngs={"latent": jax.random.PRNGKey(7)},
            )
            vid = pipeline.first_stage.decode(lat, variables=fs_vars)
            out[name] = (lat.astype(jnp.float32), vid.astype(jnp.float32))
        lat_mse = jnp.mean((out["cached"][0] - out["naive"][0]) ** 2)
        lat_scale = jnp.mean(out["naive"][0] ** 2)
        mse_c = jnp.mean((out["cached"][1] - gt[:, 1:]) ** 2)
        mse_n = jnp.mean((out["naive"][1] - gt[:, 1:]) ** 2)
        return out["cached"][1], out["naive"][1], gt, lat_mse, lat_scale, mse_c, mse_n

    vid_c, vid_n, gt, lat_mse, lat_scale, mse_c, mse_n = run_both(p_use)
    lat_mse, lat_scale, mse_c, mse_n = map(
        float, jax.device_get((lat_mse, lat_scale, mse_c, mse_n))
    )
    log_metrics(out_dir, {
        "phase": f"samplers_{split}", "samples": g,
        "cached_psnr_vs_gt": mse_to_psnr(mse_c),
        "naive_psnr_vs_gt": mse_to_psnr(mse_n),
        "psnr_gap_db": abs(mse_to_psnr(mse_c) - mse_to_psnr(mse_n)),
        "cached_vs_naive_latent_mse": lat_mse,
        "latent_scale_msq": lat_scale,
    })

    # prior-sample diversity: K draws per prompt (the randomness branch's
    # raison d'etre, reference mage_model.py:660-664)
    @jax.jit
    def run_k(p, key):
        lat = pipeline.core.apply(
            {"params": p}, lat0, text, speed, method="generate_cached",
            rngs={"latent": key},
        )
        return pipeline.first_stage.decode(lat, variables=fs_vars).astype(jnp.float32)

    vids = np.stack([
        np.asarray(jax.device_get(run_k(p_use, jax.random.PRNGKey(100 + k))))
        for k in range(K)
    ])  # (K, g, L-1, 64, 64, 1)
    gt_np = np.asarray(jax.device_get(gt))[:, 1:]
    mses = ((vids - gt_np[None]) ** 2).mean(axis=(2, 3, 4, 5))  # (K, g)
    psnrs = 10.0 * np.log10(1.0 / np.maximum(mses, 1e-12))
    pair = 0.0
    cnt = 0
    for a in range(K):
        for c in range(a + 1, K):
            pair += ((vids[a] - vids[c]) ** 2).mean()
            cnt += 1
    log_metrics(out_dir, {
        "phase": f"diversity_{split}", "samples": g, "draws": K,
        "best_of_k_psnr": float(psnrs.max(axis=0).mean()),
        "worst_of_k_psnr": float(psnrs.min(axis=0).mean()),
        "mean_psnr": float(psnrs.mean()),
        "pairwise_mse": float(pair / max(cnt, 1)),
        "gt_motion_mse_scale": float(
            ((gt_np[:, 1:] - gt_np[:, :-1]) ** 2).mean()
        ),
    })

    def to_rgb(v):
        # I3D expects float [-1, 1] (make_extractor contract)
        return np.repeat(2.0 * np.clip(v + 0.5, 0, 1) - 1.0, 3, axis=-1)

    vid_c_np = np.asarray(jax.device_get(vid_c))
    recon_np = np.asarray(jax.device_get(
        pipeline.first_stage.decode(
            DiagonalGaussian(
                mom[:g][jnp.arange(g)[:, None], pos].astype(jnp.float32)
            ).mode(),
            variables=fs_vars,
        )
    ))[:, 1:]
    e2e.log_fvd(out_dir, split, "MovingMNIST", to_rgb(gt_np),
                to_rgb(vid_c_np), to_rgb(recon_np), batch_size=8)

    e2e.write_side_gifs(out_dir, split, np.asarray(jax.device_get(gt)),
                        vid_c_np, args.gifs, scale=2.0)
    # diversity strip: K draws of prompt 0 side by side
    strip = np.concatenate([vids[k, 0] for k in range(min(K, 4))], axis=2)
    save_gif(strip, os.path.join(out_dir, "gifs", f"{split}_diversity.gif"))


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        # sized for the CPU golden diff (the 64-clip variant blew a 2,400 s
        # budget in stage 2 alone on the contended 1-vCPU host)
        args.num_train, args.num_val = 16, 8
        args.ae_ch = 32
        args.ae_epochs, args.stage2_epochs = 2, 2
        args.ae_batch, args.batch2, args.chunk = 8, 4, 2
        args.eval_videos, args.gifs = 4, 1  # >=4: the same-split FVD
        # floor needs >=2 clips per half (0-d cov crashes sqrtm)
        args.diversity_samples = 2
    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}")

    compact = dd.build_compact_single_mnist(
        args.num_train, args.num_val, args.seed, args.mnist_npz
    )
    if args.ambiguous:
        compact = make_ambiguous_text(compact, args.seed)
    dev = {
        "bank": dd.normalize_bank(compact["bank"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
    }
    print(f"resident dataset: {args.num_train} train / {args.num_val} val, "
          f"ambiguous={args.ambiguous}")

    if args.skip_ae:
        model = make_ae(args)
        # jit the template init: eager per-op init through the remote
        # relay costs hundreds of RTTs (~10 min at this size)
        tmpl = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 64, 64, 1)), jax.random.PRNGKey(0))["params"])()
        restored = Checkpointer(os.path.join(args.out, "klae")).restore(
            "best", {"params": jax.device_get(tmpl)}
        )
        ae_params = jax.device_put(restored["params"])
    else:
        model, ae_params = stage_ae(args, dev, args.out)

    if args.skip_stage2:
        return
    t0 = time.time()
    mom_train = materialize_moments(args, model, ae_params, dev, "train")
    mom_val = materialize_moments(args, model, ae_params, dev, "val")
    mom_train.block_until_ready()
    log_metrics(args.out, {"phase": "moments",
                           "train_shape": list(mom_train.shape),
                           "sec": time.time() - t0})

    pipeline = build_pipeline(args, model, ae_params)
    if args.eval_only:
        params = e2e.init_stage2_params(pipeline, args.seed,
                                        args.frames_length, (16, 16, 4),
                                        jnp.float32)
        template = {"step": jnp.zeros((), jnp.int32),
                    "params": jax.device_get(params)}
        restored = Checkpointer(os.path.join(args.out, "mage")).restore(
            args.eval_ckpt, template
        )
        params = jax.device_put(restored["params"])
    else:
        params = stage2(args, pipeline, dev, mom_train, mom_val, args.out)
    eval_generation(args, pipeline, params, dev, mom_val, "val", args.out)


if __name__ == "__main__":
    main()
