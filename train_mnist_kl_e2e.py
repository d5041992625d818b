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

Usage (real chip):
    python train_mnist_kl_e2e.py --out runs/mnist_klp_e2e --ambiguous
Smoke (CPU):
    python train_mnist_kl_e2e.py --tiny --out /tmp/e2e_kl_smoke
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data import device_data as dd
from mage_tpu.models.autoencoder_kl import AutoencoderKL, DiagonalGaussian
from mage_tpu.training.autoresume import save_last, try_restore_last
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.lr import epoch_lr
from mage_tpu.training.mage_trainer import cast_floating, make_mage_tx
from mage_tpu.training.pid import initial_pid_state, pid_update
from mage_tpu.evals.metrics import ssim as np_ssim
from mage_tpu.utils.media import save_gif


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


def log_metrics(out_dir, record):
    record = dict(record, time=time.time())
    with open(os.path.join(out_dir, "e2e_metrics.json"), "a") as fp:
        fp.write(json.dumps(record) + "\n")
    print("METRIC", json.dumps(record), flush=True)


def mse_to_psnr(mse, data_range=1.0):
    return float(10.0 * np.log10(data_range**2 / max(mse, 1e-12)))


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


# ---------------------------------------------------------------------------
# Stage A: KL autoencoder
# ---------------------------------------------------------------------------


def make_ae(args):
    return AutoencoderKL(
        embed_dim=4, ch=args.ae_ch, ch_mult=(1, 2, 4), num_res_blocks=2,
        in_channels=1, out_ch=1, z_channels=4, double_z=True, resolution=64,
        logvar_bias=args.ae_logvar_bias,
    )


def stage_ae(args, dev, out_dir):
    model = make_ae(args)
    import optax

    tx = optax.adam(args.ae_lr)
    params = model.init(
        {"params": jax.random.PRNGKey(args.seed)},
        jnp.zeros((1, 64, 64, 1)), jax.random.PRNGKey(0),
    )["params"]
    print(f"KL-AE params: "
          f"{sum(x.size for x in jax.tree_util.tree_leaves(params)):,}")
    opt_state = jax.jit(tx.init)(params)
    ckpt = Checkpointer(os.path.join(out_dir, "klae"))

    bank, tr = dev["bank"], dev["train"]
    n, t = int(tr["digit"].shape[0]), dd.SEQ_LENGTH
    b = args.ae_batch
    klw = args.ae_kl_weight

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, rng):
        def body(carry, _):
            params, opt_state, rng = carry
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            s = jax.random.randint(k1, (b,), 0, n)
            f = jax.random.randint(k2, (b,), 0, t)
            frames = dd.compose_frames(bank, tr["digit"][s], tr["ys"][s, f],
                                       tr["xs"][s, f])

            def loss_fn(p):
                recon, post = model.apply({"params": p}, frames, k3, train=True)
                rec = jnp.mean((recon - frames) ** 2)
                kl = jnp.mean(post.kl())
                return rec + klw * kl, rec

            grads, rec = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), rec

        (params, opt_state, _), recs = jax.lax.scan(
            body, (params, opt_state, rng), None, length=args.chunk
        )
        return params, opt_state, jnp.mean(recs)

    va = dev["val"]
    n_val = int(va["digit"].shape[0])
    eval_b = min(256, n_val)

    @jax.jit
    def eval_recon(params):
        s = jnp.arange(eval_b)
        frames = dd.compose_frames(bank, va["digit"][s], va["ys"][s, 0],
                                   va["xs"][s, 0])
        moments = model.apply({"params": params}, frames,
                              method="encode_moments")
        z = DiagonalGaussian(moments).mode()
        recon = model.apply({"params": params}, z, method="decode")
        return jnp.mean((recon - frames) ** 2), frames, recon

    steps_per_epoch = max(n // b, 1)
    chunks = max(round(steps_per_epoch / args.chunk), 1)
    rng = jax.random.PRNGKey(args.seed + 1)
    best = float("inf")
    start_epoch = 0
    resumed = try_restore_last(ckpt, {"params": params, "opt_state": opt_state,
                                      "rng": rng})
    if resumed is not None:
        start_epoch, best, st = resumed
        params, opt_state, rng = st["params"], st["opt_state"], st["rng"]
        print(f"klae autoresume: epoch {start_epoch}, best mse {best:.6f}")
    t0 = time.time()
    for epoch in range(start_epoch, args.ae_epochs):
        for _ in range(chunks):
            rng, sub = jax.random.split(rng)
            params, opt_state, rec = train_chunk(params, opt_state, sub)
        if epoch % 5 == 0 or epoch == args.ae_epochs - 1:
            rec = float(jax.device_get(rec))
            mse, frames, recon = eval_recon(params)
            mse = float(jax.device_get(mse))
            log_metrics(out_dir, {
                "phase": "klae", "epoch": epoch, "train_recon": rec,
                "val_recon_mse": mse, "val_recon_psnr": mse_to_psnr(mse),
                "sec_per_epoch": (time.time() - t0) / (epoch - start_epoch + 1),
            })
            if mse < best:
                best = mse
                ckpt.save("best", {"params": jax.device_get(params)})
            save_last(ckpt, epoch, best,
                      {"params": params, "opt_state": opt_state, "rng": rng})
    ckpt.save("final", {"params": jax.device_get(params)})

    mse, frames, recon = eval_recon(params)
    f_np = np.asarray(jax.device_get(frames[:32]))
    r_np = np.asarray(jax.device_get(recon[:32]))
    ssim_val = float(np.mean([np_ssim(a, c, data_range=1.0)
                              for a, c in zip(f_np[..., 0], r_np[..., 0])]))
    log_metrics(out_dir, {
        "phase": "klae_final",
        "val_recon_mse": float(jax.device_get(mse)),
        "val_recon_psnr": mse_to_psnr(float(jax.device_get(mse))),
        "val_ssim": ssim_val,
    })
    return model, params


def materialize_moments(args, model, params, dev, split):
    """Encode every stored frame -> posterior moments (N, 20, 16, 16, 8)
    bf16 (mean, logvar). Deterministic; sampling happens per train step."""
    bank, d = dev["bank"], dev[split]
    n = int(d["digit"].shape[0])
    chunk = 50

    @jax.jit
    def encode_chunk(digit_c, ys_c, xs_c):
        c = digit_c.shape[0]
        idx = jnp.repeat(digit_c, dd.SEQ_LENGTH)
        frames = dd.compose_frames(bank, idx, ys_c.reshape(-1), xs_c.reshape(-1))
        moments = model.apply({"params": params}, frames,
                              method="encode_moments")
        return moments.reshape(c, dd.SEQ_LENGTH, *moments.shape[1:]).astype(
            jnp.bfloat16
        )

    outs = []
    pad = (-n) % chunk
    dig = jnp.concatenate([d["digit"], d["digit"][:pad]]) if pad else d["digit"]
    ys = jnp.concatenate([d["ys"], d["ys"][:pad]]) if pad else d["ys"]
    xs = jnp.concatenate([d["xs"], d["xs"][:pad]]) if pad else d["xs"]
    for i in range(0, n + pad, chunk):
        outs.append(encode_chunk(dig[i:i+chunk], ys[i:i+chunk], xs[i:i+chunk]))
    return jnp.concatenate(outs)[:n]


# ---------------------------------------------------------------------------
# Stage 2: continuous MAGE+ with same-step PID auto-beta
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
    tx = make_mage_tx()
    b = args.batch2
    n = int(mom_train.shape[0])
    ctx = pipeline.core.text_context_length
    text_train = dev["train"]["text"]
    text_val = dev["val"]["text"]
    v_kl = pipeline.v_kl
    lv_shift = args.posterior_logvar_shift

    init_fn = jax.jit(
        lambda rngs, lat, txt, spd: pipeline.core.init(
            rngs, lat, txt, spd, train=True
        )["params"]
    )
    params = init_fn(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(args.seed),
         "latent": jax.random.PRNGKey(args.seed)},
        jnp.zeros((1, args.frames_length, 16, 16, 4), jnp.float32),
        jnp.zeros((1, ctx), jnp.int32),
        jnp.zeros((1,), jnp.float32),
    )
    print(f"stage-2 params: "
          f"{sum(x.size for x in jax.tree_util.tree_leaves(params)):,}")
    opt_state = jax.jit(tx.init)(params)
    step = jnp.zeros((), jnp.int32)
    compute_dtype = jnp.bfloat16 if args.bf16 else None

    # the resident moments/text arrays are passed as jit ARGUMENTS, not
    # closure constants: closed-over device arrays are serialized with the
    # program by the remote AOT compile helper, and the 0.8 GB moments
    # array overflows its request limit (HTTP 413)
    def batch_at(rng, mom, text):
        k1, k2, k3 = jax.random.split(rng, 3)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=args.frames_length))(speed)
        lat = sample_latents(mom[idx[:, None], pos], k3, lv_shift)
        return {"latents": lat, "text": text[idx], "speed": speed}

    def loss_fn(params, batch, rng, pid_state):
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
        terms = pipeline.loss_terms(params, batch, rng, train=True,
                                    compute_dtype=compute_dtype)
        # same-step PID auto-beta (reference mage_model.py:628-631)
        beta, new_pid = pid_update(
            pid_state, v_kl,
            jax.lax.stop_gradient(terms["kl_loss"]).astype(jnp.float32),
        )
        final = (terms["prediction"].astype(jnp.float32)
                 + jax.lax.stop_gradient(beta) * terms["kl_loss"].astype(jnp.float32))
        terms = {k: v.astype(jnp.float32) for k, v in terms.items()}
        terms.update(final_loss=final, beta=beta)
        return final, (terms, new_pid)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, step, pid_state, rng, lr, mom, text):
        def body(carry, _):
            params, opt_state, step, pid_state, rng = carry
            rng, kb, kl = jax.random.split(rng, 3)
            batch = batch_at(kb, mom, text)
            grads, (terms, pid_state) = jax.grad(loss_fn, has_aux=True)(
                params, batch, kl, pid_state
            )
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return ((params, opt_state, step + 1, pid_state, rng),
                    (terms["final_loss"], terms["kl_loss"], terms["beta"]))

        (params, opt_state, step, pid_state, _), (losses, kls, betas) = jax.lax.scan(
            body, (params, opt_state, step, pid_state, rng), None,
            length=args.chunk,
        )
        return (params, opt_state, step, pid_state,
                jnp.mean(losses), jnp.mean(kls), betas[-1])

    n_val = int(mom_val.shape[0])
    eval_b = min(64, n_val)

    @jax.jit
    def eval_chunk(params, beta, rng, mom, text):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=args.frames_length))(speed)
        batch = {"latents": sample_latents(mom[idx[:, None], pos], k4, lv_shift),
                 "text": text[idx], "speed": speed}
        p = cast_floating(params, compute_dtype) if compute_dtype else params
        terms = pipeline.loss_terms(p, batch, k3, train=False,
                                    compute_dtype=compute_dtype)
        return (terms["prediction"].astype(jnp.float32)
                + beta * terms["kl_loss"].astype(jnp.float32),
                terms["prediction"].astype(jnp.float32))

    steps_per_epoch = max(n // b, 1)
    chunks = max(round(steps_per_epoch / args.chunk), 1)
    rng = jax.random.PRNGKey(args.seed + 2)
    ckpt = Checkpointer(os.path.join(out_dir, "mage"))
    pid_state = initial_pid_state()
    best = float("inf")
    start_epoch = 0
    resumed = try_restore_last(ckpt, {"params": params, "opt_state": opt_state,
                                      "step": step, "pid": pid_state,
                                      "rng": rng})
    if resumed is not None:
        # the PID controller state resumes too: beta regulation continues
        # from where the crashed run left off instead of re-winding up
        start_epoch, best, st = resumed
        params, opt_state = st["params"], st["opt_state"]
        step, pid_state, rng = st["step"], st["pid"], st["rng"]
        print(f"stage-2 autoresume: epoch {start_epoch}, best {best:.4f}")
    t0 = time.time()
    for epoch in range(start_epoch, args.stage2_epochs):
        lr = epoch_lr(args.lr2, epoch, args.stage2_epochs, cos=True)
        for _ in range(chunks):
            rng, sub = jax.random.split(rng)
            (params, opt_state, step, pid_state, loss, klm, beta) = train_chunk(
                params, opt_state, step, pid_state, sub, lr, mom_train,
                text_train,
            )
        if epoch % 5 == 0 or epoch == args.stage2_epochs - 1:
            loss, klm, beta = map(float, jax.device_get((loss, klm, beta)))
            val_loss, val_pred = map(float, jax.device_get(
                eval_chunk(params, beta, jax.random.PRNGKey(args.seed + 3),
                           mom_val, text_val)
            ))
            log_metrics(out_dir, {
                "phase": "stage2", "epoch": epoch, "lr": lr, "train_loss": loss,
                "train_kl": klm, "beta": beta,
                "val_loss": val_loss, "val_prediction": val_pred,
                "sec_per_epoch": (time.time() - t0) / (epoch - start_epoch + 1),
            })
            improved = val_loss < best
            if improved:
                best = val_loss
                ckpt.save("best", {"step": jax.device_get(step),
                                   "params": jax.device_get(params)})
            # save_last also on improvement: a crash between "best" and the
            # next 10-epoch "last" would otherwise resume with a stale best
            # metric and overwrite the true pre-crash best checkpoint
            if improved or epoch % 10 == 0 or epoch == args.stage2_epochs - 1:
                save_last(ckpt, epoch, best,
                          {"params": params, "opt_state": opt_state,
                           "step": step, "pid": pid_state, "rng": rng})
    ckpt.save("final", {"step": jax.device_get(step),
                        "params": jax.device_get(params)})
    return params


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

    # FVD: generated vs GT clip distributions through the in-repo I3D
    # extractor. No Kinetics checkpoint ships in this offline image, so the
    # extractor uses documented RANDOM weights (fixed seed): a random-
    # projection Frechet distance — 0 for identical distributions, and the
    # recon upper bound is reported alongside for calibration.
    from mage_tpu.evals.fvd import (compute_fvd, fvd_same_split_floor,
                                    resolve_extractor)

    extractor, fvd_prov, fvd_dim = resolve_extractor("MovingMNIST",
                                                     batch_size=8)

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
    fvd_gen = compute_fvd(to_rgb(gt_np), to_rgb(vid_c_np), extractor)
    fvd_recon = compute_fvd(to_rgb(gt_np), to_rgb(recon_np), extractor)
    fvd_floor = fvd_same_split_floor(to_rgb(gt_np), extractor)
    log_metrics(out_dir, {
        "phase": f"fvd_{split}", "samples": g,
        "fvd_gen_vs_gt": float(fvd_gen),
        "fvd_recon_vs_gt": float(fvd_recon),
        "fvd_same_split_floor": float(fvd_floor),
        "fvd_gen_over_floor": float(fvd_gen / max(fvd_floor, 1e-12)),
        "extractor": fvd_prov,
        "feature_dim": fvd_dim,
    })

    few = np.asarray(jax.device_get(vid_c))[: args.gifs]
    few_gt = gt_np[: args.gifs]
    os.makedirs(os.path.join(out_dir, "gifs"), exist_ok=True)
    for i in range(few.shape[0]):
        side = np.concatenate([few_gt[i], few[i]], axis=2) * 2.0
        save_gif(side, os.path.join(out_dir, "gifs", f"{split}_{i}.gif"))
    # diversity strip: K draws of prompt 0 side by side
    strip = np.concatenate([vids[k, 0] for k in range(min(K, 4))], axis=2)
    save_gif(strip, os.path.join(out_dir, "gifs", f"{split}_diversity.gif"))


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        args.num_train, args.num_val = 64, 16
        args.ae_ch = 32
        args.ae_epochs, args.stage2_epochs = 2, 2
        args.ae_batch, args.batch2, args.chunk = 8, 4, 2
        args.eval_videos, args.gifs = 4, 1
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
        ctx = pipeline.core.text_context_length
        init_fn = jax.jit(
            lambda: pipeline.core.init(
                {"params": jax.random.PRNGKey(args.seed),
                 "dropout": jax.random.PRNGKey(args.seed),
                 "latent": jax.random.PRNGKey(args.seed)},
                jnp.zeros((1, args.frames_length, 16, 16, 4), jnp.float32),
                jnp.zeros((1, ctx), jnp.int32), jnp.zeros((1,), jnp.float32),
                train=True,
            )["params"]
        )
        template = {"step": jnp.zeros((), jnp.int32),
                    "params": jax.device_get(init_fn())}
        restored = Checkpointer(os.path.join(args.out, "mage")).restore(
            args.eval_ckpt, template
        )
        params = jax.device_put(restored["params"])
    else:
        params = stage2(args, pipeline, dev, mom_train, mom_val, args.out)
    eval_generation(args, pipeline, params, dev, mom_val, "val", args.out)


if __name__ == "__main__":
    main()
