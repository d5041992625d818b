"""End-to-end MAGE+ (continuous KL first stage) on synthetic CATER-GEN-v2.

The last BASELINE.json recipe: "MAGE+ on CATER-GEN-v2 (stronger
autoencoder + VAE controller, diverse sampling)". The real CATER-GEN-v2
Blender renders are unavailable offline, so this drives the full
config/mage+_caterv2.yaml chain — AutoencoderKL f8 at 128px (continuous
16x16x4 latents), stage-2 MAGE+ with the stochastic randomness branch and
same-step PID auto-beta (v_kl 100), AMBIGUOUS quadrant captions (the
reference pairs randomness with ambiguous annotations, dataload.py:290-292:
the destination inside the captioned quadrant is genuinely
under-determined, so prior samples must supply it) — on the procedural
CATER stand-in of generators/cater_synthetic.py.

Evaluation: both samplers (naive reference-parity O(L^2) loop,
mage_model.py:641-693, vs the causal-GN O(L) cached sampler),
prior-sample diversity (K draws per prompt), quadrant-level Action /
Referring precision by sprite tracking (any endpoint inside the captioned
quadrant satisfies the text), and FVD.

The training loops live in mage_tpu/training/e2e.py (shared by all five
e2e chains); this driver supplies the dataset/variant-specific pieces.

Usage (real chip):
    python train_cater_kl_e2e.py --out runs/cater_kl_e2e
Smoke (CPU):
    python train_cater_kl_e2e.py --tiny --out /tmp/cater_kl_smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import train_cater_e2e as ce
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.models.autoencoder_kl import AutoencoderKL, DiagonalGaussian
from mage_tpu.training import e2e
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.mage_trainer import cast_floating
from mage_tpu.utils.media import save_gif

T_STORE = cs.T_STORE
log_metrics = ce.log_metrics
mse_to_psnr = ce.mse_to_psnr  # pixels in [-1, 1] -> data_range 2


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/cater_kl_e2e")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-train", type=int, default=3000)
    p.add_argument("--num-val", type=int, default=600)
    # stage A: KL autoencoder f8 at 128px (config/mage+_caterv2.yaml
    # ddconfig; ch scaled down from the pretrained-ldm 128 for offline
    # training time)
    p.add_argument("--ae-ch", type=int, default=64)
    p.add_argument("--ae-epochs", type=int, default=40)
    p.add_argument("--ae-batch", type=int, default=32)
    p.add_argument("--ae-lr", type=float, default=1e-4)
    p.add_argument("--ae-kl-weight", type=float, default=1e-6)
    p.add_argument("--ae-logvar-bias", type=float, default=0.0)
    p.add_argument("--posterior-logvar-shift", type=float, default=-4.0,
                   help="stage-2 post-hoc logvar shift on stored moments "
                        "(short MSE-dominant AE trainings leave posterior "
                        "var ~1, drowning stage-2 targets; the reference's "
                        "pretrained-ldm regime has tight posteriors)")
    # stage 2
    p.add_argument("--config", default="config/mage+_caterv2.yaml")
    p.add_argument("--stage2-epochs", type=int, default=40)
    p.add_argument("--batch2", type=int, default=16)
    p.add_argument("--lr2", type=float, default=5e-5)
    p.add_argument("--static-context-prob", type=float, default=0.0,
                   help="per-sample probability of replacing the teacher-"
                   "forced context with frame-0-repeated (targets stay GT) "
                   "— anti-AR-drift augmentation; see "
                   "scripts/diag_magep_semantic.py")
    p.add_argument("--motion-loss-weight", type=float, default=0.0)
    p.add_argument("--v-kl", type=float, default=None,
                   help="override the config's PID KL target (yaml: 100)")
    p.add_argument("--frames-length", type=int, default=10)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--skip-ae", action="store_true")
    p.add_argument("--skip-stage2", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--eval-ckpt", default="final")
    p.add_argument("--eval-videos", type=int, default=48)
    p.add_argument("--diversity-samples", type=int, default=8)
    p.add_argument("--gifs", type=int, default=6)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--tiny", action="store_true")
    return p.parse_args(argv)


# ---------------------------------------------------------------------------
# Stage A: KL autoencoder f8 at 128px (shared loop in e2e.py)
# ---------------------------------------------------------------------------


def make_ae(args):
    return AutoencoderKL(
        embed_dim=4, ch=args.ae_ch, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
        in_channels=3, out_ch=3, z_channels=4, double_z=True, resolution=128,
        logvar_bias=args.ae_logvar_bias,
    )


def stage_ae(args, dev, out_dir):
    model = make_ae(args)
    params = e2e.run_klae_stage1(
        args, model,
        frames_at=lambda split, idx, t: ce.frames_at(dev, split, idx, t),
        t_store=T_STORE,
        n_train=int(dev["train"]["sid"].shape[0]),
        n_val=int(dev["val"]["sid"].shape[0]),
        input_shape=(128, 128, 3),
        out_dir=out_dir,
        eval_cap=64,
        ssim_count=16,
        data_range=2.0,
    )
    return model, params


def materialize_moments(args, model, params, dev, split):
    """Encode every stored frame -> posterior moments
    (N, T_STORE, 16, 16, 8) bf16; sampling happens per train step
    (the reference's stochastic get_first_stage_encoding,
    mage_model.py:542-549, without re-running the encoder)."""
    n = int(dev[split]["sid"].shape[0])
    # 5-clip chunks = 120 128px frames/dispatch (25-clip chunks OOM'd the
    # discrete chain's f32 encoder at this resolution; headroom here)

    @jax.jit
    def encode_chunk(idx):
        c = idx.shape[0]
        flat_idx = jnp.repeat(idx, T_STORE)
        t = jnp.tile(jnp.arange(T_STORE), c)
        frames = ce.frames_at(dev, split, flat_idx, t)
        moments = model.apply({"params": params}, frames,
                              method="encode_moments")
        return moments.reshape(c, T_STORE, *moments.shape[1:]).astype(
            jnp.bfloat16
        )

    return e2e.materialize(n, 5, encode_chunk)


# ---------------------------------------------------------------------------
# Stage 2: continuous MAGE+ with same-step PID auto-beta (loop in e2e.py)
# ---------------------------------------------------------------------------


def build_pipeline(args, ae_model, ae_params):
    from mage_tpu.config import load_config
    from mage_tpu.models.pipeline import MagePipeline

    cfg = load_config(args.config)
    p = cfg.model.params
    p.first_stage_config.params.pop("ckpt_path", None)
    p.first_stage_config.params.ddconfig.ch = args.ae_ch
    p.frames_length = args.frames_length
    p.generate_decoder_config.params.frames_length = args.frames_length
    if args.v_kl is not None:
        p.v_kl = args.v_kl
    if args.motion_loss_weight:
        p.motion_loss_weight = args.motion_loss_weight
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
    """(..., 8) bf16 moments -> (..., 4) sampled bf16 latents."""
    mom = moments.astype(jnp.float32)
    if logvar_shift:
        mean, logvar = jnp.split(mom, 2, axis=-1)
        mom = jnp.concatenate([mean, logvar + logvar_shift], axis=-1)
    return DiagonalGaussian(mom).sample(rng).astype(jnp.bfloat16)


def init_stage2_params(args, pipeline):
    return e2e.init_stage2_params(pipeline, args.seed, args.frames_length,
                                  (16, 16, 4), jnp.float32)


def stage2(args, pipeline, dev, mom_train, mom_val, out_dir):
    b = args.batch2
    n = int(mom_train.shape[0])
    n_val = int(mom_val.shape[0])
    eval_b = min(64, n_val)
    lv_shift = args.posterior_logvar_shift

    def batch_at(rng, mom, text):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(
            lambda s: ce.clip_positions(s, args.frames_length))(speed)
        lat = sample_latents(mom[idx[:, None], pos], k3, lv_shift)
        batch = {"latents": lat, "text": text[idx], "speed": speed}
        if args.static_context_prob > 0:
            # anti-drift augmentation: for a random subset of the batch the
            # decoder conditions on the frame-0-repeated (static) context the
            # AR rollout degenerates into, while the loss targets stay GT
            static = jnp.broadcast_to(lat[:, :1], lat.shape)
            pick = jax.random.bernoulli(
                k4, args.static_context_prob, (b,))[:, None, None, None, None]
            batch["context_latents"] = jnp.where(pick, static, lat)
        return batch

    def val_batch_at(rng, mom, text):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(
            lambda s: ce.clip_positions(s, args.frames_length))(speed)
        batch = {
            "latents": sample_latents(mom[idx[:, None], pos], k4, lv_shift),
            "text": text[idx], "speed": speed,
        }
        return batch, k3

    return e2e.run_mage_plus_stage2(
        args, pipeline,
        batch_at=batch_at, val_batch_at=val_batch_at,
        mom_train=mom_train, mom_val=mom_val,
        text_train=dev["train"]["text"], text_val=dev["val"]["text"],
        out_dir=out_dir,
    )


# ---------------------------------------------------------------------------
# Evaluation: both samplers + diversity + quadrant-level precision + FVD
# ---------------------------------------------------------------------------


def eval_generation(args, pipeline, params, dev, compact, mom, split,
                    out_dir):
    d = dev[split]
    g = min(args.eval_videos, int(mom.shape[0]))
    K = args.diversity_samples
    text = d["text"][:g]
    # speed 1.0 -> sampled positions span all stored frames; final frame
    # shows settled end states (see train_cater_e2e.eval_generation)
    speed_f32 = jnp.full((g,), 1.0, jnp.float32)
    pos = jax.vmap(
        lambda s: ce.clip_positions(s, args.frames_length))(speed_f32)
    fs_vars = pipeline.first_stage.variables
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    speed = speed_f32.astype(compute_dtype) if compute_dtype else speed_f32
    p_use = cast_floating(params, compute_dtype) if compute_dtype else params
    lat0 = DiagonalGaussian(mom[:g, :1].astype(jnp.float32)).mode()
    if compute_dtype:
        lat0 = lat0.astype(compute_dtype)
    idxg = jnp.arange(g)

    @jax.jit
    def run_both(p):
        # flat single-level composition: vmapping frames_at over the clip
        # index nests a second vmap around compose_frames_cater's internal
        # one, which XLA miscompiles (wrong sprites / alpha-box artifacts;
        # see tests/test_device_data.py nested-vmap regression). The flat
        # form matches the proven materialize call shape.
        gt_flat = ce.frames_at(
            dev, split, jnp.repeat(idxg, pos.shape[1]), pos.reshape(-1))
        gt = gt_flat.reshape(g, pos.shape[1], *gt_flat.shape[1:])
        out = {}
        for name, method in (("cached", "generate_cached"),
                             ("naive", "generate")):
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
        recon_gt = pipeline.first_stage.decode(
            DiagonalGaussian(
                mom[:g][idxg[:, None], pos].astype(jnp.float32)).mode(),
            variables=fs_vars,
        )
        mse_recon = jnp.mean((recon_gt[:, 1:] - gt[:, 1:]) ** 2)
        return (out["cached"][1], out["naive"][1], gt, recon_gt,
                lat_mse, lat_scale, mse_c, mse_n, mse_recon)

    (vid_c, vid_n, gt, recon_gt, lat_mse, lat_scale, mse_c, mse_n,
     mse_recon) = run_both(p_use)
    lat_mse, lat_scale, mse_c, mse_n, mse_recon = map(
        float, jax.device_get((lat_mse, lat_scale, mse_c, mse_n, mse_recon))
    )
    log_metrics(out_dir, {
        "phase": f"samplers_{split}", "samples": g,
        "cached_psnr_vs_gt": mse_to_psnr(mse_c),
        "naive_psnr_vs_gt": mse_to_psnr(mse_n),
        "psnr_gap_db": abs(mse_to_psnr(mse_c) - mse_to_psnr(mse_n)),
        "cached_vs_naive_latent_mse": lat_mse,
        "latent_scale_msq": lat_scale,
        "recon_psnr_vs_gt_upper_bound": mse_to_psnr(mse_recon),
    })

    # prior-sample diversity: K draws per prompt; under ambiguous quadrant
    # captions the endpoint inside the quadrant is prior-determined
    @jax.jit
    def run_k(p, key):
        lat = pipeline.core.apply(
            {"params": p}, lat0, text, speed, method="generate_cached",
            rngs={"latent": key},
        )
        return pipeline.first_stage.decode(
            lat, variables=fs_vars).astype(jnp.float32)

    vids = np.stack([
        np.asarray(jax.device_get(run_k(p_use, jax.random.PRNGKey(100 + k))))
        for k in range(K)
    ])  # (K, g, L-1, 128, 128, 3)
    gt_np = np.asarray(jax.device_get(gt), np.float64)
    mses = ((vids - gt_np[None, :, 1:]) ** 2).mean(axis=(2, 3, 4, 5))
    psnrs = 10.0 * np.log10(4.0 / np.maximum(mses, 1e-12))
    pair = 0.0
    cnt = 0
    for a in range(K):
        for c in range(a + 1, K):
            pair += ((vids[a] - vids[c]) ** 2).mean()
            cnt += 1
    metas = compact[split]["meta"][:g]
    bank_index = compact["bank_index"]
    bank_arr = compact["bank"]
    # per-draw quadrant-level precision: every draw should satisfy the
    # caption even when the endpoints differ draw to draw
    pm_draws = [
        ce.precision_metrics(vids[k].astype(np.float64), metas, bank_index,
                             bank_arr, quadrant_level=True)
        for k in range(min(K, 4))
    ]
    log_metrics(out_dir, {
        "phase": f"diversity_{split}", "samples": g, "draws": K,
        "best_of_k_psnr": float(psnrs.max(axis=0).mean()),
        "worst_of_k_psnr": float(psnrs.min(axis=0).mean()),
        "mean_psnr": float(psnrs.mean()),
        "pairwise_mse": float(pair / max(cnt, 1)),
        "gt_motion_mse_scale": float(
            ((gt_np[:, 1:] - gt_np[:, :-1]) ** 2).mean()
        ),
        "per_draw_action_precision": [
            pm["action_precision"] for pm in pm_draws],
        "per_draw_referring_precision": [
            pm["referring_precision"] for pm in pm_draws],
    })

    gen_np = np.asarray(jax.device_get(vid_c), np.float64)
    pm = ce.precision_metrics(gen_np, metas, bank_index, bank_arr,
                              quadrant_level=True)
    pm_gt = ce.precision_metrics(gt_np[:, 1:], metas, bank_index, bank_arr,
                                 quadrant_level=True)
    log_metrics(out_dir, {
        "phase": f"generation_{split}", "samples": g,
        "gen_psnr_vs_gt": mse_to_psnr(mse_c),
        "recon_psnr_vs_gt_upper_bound": mse_to_psnr(mse_recon),
        **pm,
        "gt_action_precision_ceiling": pm_gt["action_precision"],
        "gt_referring_precision_ceiling": pm_gt["referring_precision"],
    })

    recon_np = np.asarray(jax.device_get(recon_gt), np.float64)[:, 1:]
    e2e.log_fvd(out_dir, split, "CATER-GEN-v2", gt_np[:, 1:], gen_np,
                recon_np, batch_size=4)

    e2e.write_side_gifs(out_dir, split, gt_np, gen_np, args.gifs)
    strip = np.concatenate(
        [vids[k, 0] for k in range(min(K, 4))], axis=2)
    save_gif(strip, os.path.join(out_dir, "gifs", f"{split}_diversity.gif"))


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        # small enough for the CPU golden diff: 128^2 KL-AE encodes on the
        # 1-vCPU host run ~45 s/frame-batch; 48 scenes blew the 2,400 s
        # budget on the klae epoch alone (r5 session-2 handoff)
        args.num_train, args.num_val = 8, 8
        args.ae_ch = 32  # GroupNorm(32) needs ch multiples of 32
        args.ae_epochs, args.stage2_epochs = 1, 2
        args.ae_batch, args.batch2, args.chunk = 4, 4, 2
        args.eval_videos, args.gifs = 4, 1  # >=4: the same-split FVD
        # floor needs >=2 clips per half (0-d cov crashes sqrtm)
        args.diversity_samples = 2
    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}")

    # ambiguous quadrant captions: the reference pairs randomness with the
    # ambiguous annotation file (dataload.py:290-292)
    compact = cs.build_compact_cater(args.num_train, args.num_val, args.seed,
                                     mode="ambiguous",
                                     dataset="CATER-GEN-v2",
                                     context_length=38)
    norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0  # noqa: E731
    dev = {
        "bank": jnp.concatenate(
            [norm(compact["bank"][..., :3]),
             jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1
        ),
        "background": norm(compact["background"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()
                  if k != "meta"},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()
                if k != "meta"},
    }
    print(f"resident dataset: {compact['bank'].nbytes/1e6:.1f} MB bank, "
          f"{args.num_train} train / {args.num_val} val scenes, ambiguous")

    if args.skip_ae or args.eval_only:
        model = make_ae(args)
        tmpl = jax.jit(lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 128, 128, 3)), jax.random.PRNGKey(0))["params"])()
        restored = Checkpointer(os.path.join(args.out, "klae")).restore(
            "best", {"params": jax.device_get(tmpl)}
        )
        ae_params = jax.device_put(restored["params"])
    else:
        model, ae_params = stage_ae(args, dev, args.out)

    if args.skip_stage2 and not args.eval_only:
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
        template = {"step": jnp.zeros((), jnp.int32),
                    "params": jax.device_get(init_stage2_params(args,
                                                                pipeline))}
        restored = Checkpointer(os.path.join(args.out, "mage")).restore(
            args.eval_ckpt, template
        )
        params = jax.device_put(restored["params"])
    else:
        params = stage2(args, pipeline, dev, mom_train, mom_val, args.out)
    eval_generation(args, pipeline, params, dev, compact, mom_val, "val",
                    args.out)


if __name__ == "__main__":
    main()
