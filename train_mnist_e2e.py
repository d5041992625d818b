"""End-to-end Moving-MNIST training on one TPU chip with fully resident data.

Trains the reference's complete MNIST chain (train_vqvae.py stage 1 ->
main_mage.py stage 2, config/mage_mnist.yaml) to quality on the tunneled
single-chip backend, where per-step host<->device transfers are ruinous
(~0.5 MB/s). Strategy (see mage_tpu/data/device_data.py):

1. build the compact dataset on the host (digit bank + trajectories +
   caption tokens, ~10 MB) — the exact dataset generators/mnist_single.py
   writes for the same seed — and upload it once;
2. stage 1: VQ-VAE trained on frames composed ON DEVICE, many steps fused
   into one jitted lax.scan per dispatch;
3. materialize latent ids for all stored frames on device (encode is
   per-frame, so speed-conditioned clips become latent gathers — exact);
4. stage 2: MAGE trained on resident latent ids (scan-fused);
5. evaluate: recon MSE/PSNR/SSIM, stage-2 losses, AR-generation PSNR vs
   ground truth, and sample GIFs; everything appended to
   <out>/e2e_metrics.json.

Usage (real chip):
    python train_mnist_e2e.py --out runs/mnist_e2e
Smoke (CPU):
    python train_mnist_e2e.py --tiny --out /tmp/e2e_smoke
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
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training import vqvae_trainer as vt
from mage_tpu.training.autoresume import save_last, try_restore_last
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.lr import epoch_lr
from mage_tpu.training.mage_trainer import make_mage_tx
from mage_tpu.evals.metrics import ssim as np_ssim
from mage_tpu.utils.media import save_gif


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/mnist_e2e")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mnist-npz", default=None)
    p.add_argument("--num-train", type=int, default=10000)
    p.add_argument("--num-val", type=int, default=2000)
    # stage 1 (reference train_vqvae.py:197-207: dim 256, K 512, lr 1e-4,
    # beta 2.0, 200 epochs, batch 16 — batch raised for TPU utilization,
    # epoch = one random frame per clip like MovingMnist4VQVAE)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--codebook", type=int, default=512)
    p.add_argument("--stage1-epochs", type=int, default=200)
    p.add_argument("--batch1", type=int, default=128)
    p.add_argument("--lr1", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=2.0)
    # stage 2 (config/mage_mnist.yaml)
    p.add_argument("--config", default="config/mage_mnist.yaml")
    p.add_argument("--stage2-epochs", type=int, default=201)
    p.add_argument("--batch2", type=int, default=16)
    p.add_argument("--lr2", type=float, default=5e-5)
    p.add_argument("--frames-length", type=int, default=16)
    p.add_argument("--chunk", type=int, default=50, help="train steps per dispatch")
    p.add_argument("--skip-stage1", action="store_true",
                   help="restore stage-1 from <out>/vqvae/best instead of training")
    p.add_argument("--skip-stage2", action="store_true")
    p.add_argument("--eval-videos", type=int, default=64)
    p.add_argument("--gifs", type=int, default=4)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in stage-2 training (params stay f32)")
    p.add_argument("--motion-loss-weight", type=float, default=0.0,
                   help="opt-in motion-weighted recon loss "
                        "(MAGECore.motion_loss_weight; 0 = reference-exact)")
    p.add_argument("--early-loss-weight", type=float, default=0.0,
                   help="opt-in early-frame loss upweighting "
                        "(MAGECore.early_loss_weight): targets initial-"
                        "direction SIGN binding, the weakest caption bit "
                        "(65-73%% sign-given-axis after 201 epochs, "
                        "docs/results/direction_binding_single.md)")
    p.add_argument("--early-loss-frames", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="CPU smoke test scale")
    return p.parse_args(argv)


def log_metrics(out_dir, record):
    record = dict(record, time=time.time())
    with open(os.path.join(out_dir, "e2e_metrics.json"), "a") as fp:
        fp.write(json.dumps(record) + "\n")
    print("METRIC", json.dumps(record), flush=True)


def mse_to_psnr(mse, data_range=1.0):
    # frames live in [-0.5, 0.5] -> range 1.0
    return float(10.0 * np.log10(data_range**2 / max(mse, 1e-12)))


# ---------------------------------------------------------------------------
# Stage 1
# ---------------------------------------------------------------------------


def stage1(args, dev, out_dir):
    model = VectorQuantizedVAE(
        input_dim=1, down_ratio=4, dim=args.dim, K=args.codebook
    )
    tx = vt.make_tx(args.lr1)
    state = vt.create_state(
        model, jax.random.PRNGKey(args.seed), jnp.zeros((1, 64, 64, 1)), tx
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"stage-1 params: {n_params:,}")
    ckpt = Checkpointer(os.path.join(out_dir, "vqvae"))

    bank, tr = dev["bank"], dev["train"]
    n, t = int(tr["digit"].shape[0]), dd.SEQ_LENGTH
    b = args.batch1

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_chunk(state, rng, lr):
        def body(carry, _):
            state, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            s = jax.random.randint(k1, (b,), 0, n)
            f = jax.random.randint(k2, (b,), 0, t)
            frames = dd.compose_frames(bank, tr["digit"][s], tr["ys"][s, f], tr["xs"][s, f])

            def loss_fn(params):
                return vt.loss_terms(model, params, state.batch_stats, frames,
                                     args.beta1, True)

            grads, (mutated, aux) = jax.grad(loss_fn, has_aux=True)(state.params)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            updates, new_opt = tx.update(grads, opt_state, state.params)
            state = state.replace(
                step=state.step + 1,
                params=jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params, updates
                ),
                batch_stats=mutated["batch_stats"],
                opt_state=new_opt,
            )
            return (state, rng), aux["total"]

        (state, _), losses = jax.lax.scan(body, (state, rng), None, length=args.chunk)
        return state, jnp.mean(losses)

    va = dev["val"]
    n_val = int(va["digit"].shape[0])
    eval_b = min(512, n_val)

    @jax.jit
    def eval_recon(state, frame_idx):
        """Val recon MSE: eval-mode BN (the statistics stage 2 will use)."""
        s = jnp.arange(eval_b)
        frames = dd.compose_frames(
            bank, va["digit"][s], va["ys"][s, frame_idx], va["xs"][s, frame_idx]
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ids = model.apply(variables, frames, method="encode", mutable=False)
        recon = model.apply(variables, ids, method="decode", mutable=False)
        used = jnp.unique(ids, size=args.codebook, fill_value=-1)
        return (
            jnp.mean((recon - frames) ** 2),
            jnp.sum(used >= 0),
            frames,
            recon,
        )

    steps_per_epoch = max(n // b, 1)
    chunks = max(round(steps_per_epoch / args.chunk), 1)
    rng = jax.random.PRNGKey(args.seed + 1)
    best = float("inf")
    start_epoch = 0
    resumed = try_restore_last(ckpt, {"train": state, "rng": rng})
    if resumed is not None:
        start_epoch, best, st = resumed
        state, rng = st["train"], st["rng"]
        print(f"stage-1 autoresume: epoch {start_epoch}, best mse {best:.6f}")
    t0 = time.time()
    for epoch in range(start_epoch, args.stage1_epochs):
        for _ in range(chunks):
            rng, sub = jax.random.split(rng)
            state, loss = train_chunk(state, sub, args.lr1)
        loss = float(jax.device_get(loss))
        if epoch % 10 == 0 or epoch == args.stage1_epochs - 1:
            mse, used, frames, recon = eval_recon(state, jnp.int32(0))
            mse, used = float(jax.device_get(mse)), int(jax.device_get(used))
            log_metrics(out_dir, {
                "phase": "stage1", "epoch": epoch, "train_loss": loss,
                "val_recon_mse": mse, "val_recon_psnr": mse_to_psnr(mse),
                "codebook_used": used,
                "sec_per_epoch": (time.time() - t0) / (epoch - start_epoch + 1),
            })
            if mse < best:
                best = mse
                ckpt.save("best", jax.device_get(state))
            save_last(ckpt, epoch, best, {"train": state, "rng": rng})
    ckpt.save("final", jax.device_get(state))

    # host-side SSIM + grids on a small fetched subset
    mse, used, frames, recon = eval_recon(state, jnp.int32(0))
    f_np = np.asarray(jax.device_get(frames[: args.eval_videos]))
    r_np = np.asarray(jax.device_get(recon[: args.eval_videos]))
    ssim_val = float(np.mean([np_ssim(a, b, data_range=1.0)
                              for a, b in zip(f_np[..., 0], r_np[..., 0])]))
    final_mse = float(jax.device_get(mse))
    log_metrics(out_dir, {
        "phase": "stage1_final", "val_recon_mse": final_mse,
        "val_recon_psnr": mse_to_psnr(final_mse), "val_ssim": ssim_val,
        "codebook_used": int(jax.device_get(used)),
    })
    return model, state


def materialize_latents(args, model, state, dev, split):
    """Encode every stored frame of ``split`` -> resident ids (N, 20, h, w)."""
    bank, d = dev["bank"], dev[split]
    n = int(d["digit"].shape[0])
    chunk = 50
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def encode_chunk(digit_c, ys_c, xs_c):
        c = digit_c.shape[0]
        idx = jnp.repeat(digit_c, dd.SEQ_LENGTH)
        frames = dd.compose_frames(
            bank, idx, ys_c.reshape(-1), xs_c.reshape(-1)
        )
        ids = model.apply(variables, frames, method="encode", mutable=False)
        return ids.reshape(c, dd.SEQ_LENGTH, *ids.shape[1:]).astype(jnp.int32)

    outs = []
    pad = (-n) % chunk
    dig = jnp.concatenate([d["digit"], d["digit"][:pad]]) if pad else d["digit"]
    ys = jnp.concatenate([d["ys"], d["ys"][:pad]]) if pad else d["ys"]
    xs = jnp.concatenate([d["xs"], d["xs"][:pad]]) if pad else d["xs"]
    for i in range(0, n + pad, chunk):
        outs.append(encode_chunk(dig[i:i+chunk], ys[i:i+chunk], xs[i:i+chunk]))
    return jnp.concatenate(outs)[:n]


# ---------------------------------------------------------------------------
# Stage 2
# ---------------------------------------------------------------------------


def build_pipeline(args, fs_variables):
    from mage_tpu.config import load_config, instantiate_from_config

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
    # pass the trained first-stage variables directly (not through the config
    # merge, which deep-copies — these are device arrays)
    from mage_tpu.models.pipeline import MagePipeline

    return MagePipeline(first_stage_variables=fs_variables,
                        **cfg.model.params.to_dict())


def stage2(args, pipeline, dev, ids_train, ids_val, out_dir):
    tx = make_mage_tx()
    b = args.batch2
    n = int(ids_train.shape[0])
    ctx = pipeline.core.text_context_length
    text_train = dev["train"]["text"]
    text_val = dev["val"]["text"]

    init_fn = jax.jit(
        lambda rngs, lat, txt, spd: pipeline.core.init(rngs, lat, txt, spd, train=True)[
            "params"
        ]
    )
    params = init_fn(
        {"params": jax.random.PRNGKey(args.seed),
         "dropout": jax.random.PRNGKey(args.seed),
         "latent": jax.random.PRNGKey(args.seed)},
        jnp.zeros((1, args.frames_length, *ids_train.shape[2:]), jnp.int32),
        jnp.zeros((1, ctx), jnp.int32),
        jnp.zeros((1,), jnp.float32),
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"stage-2 params: {n_params:,}")
    opt_state = jax.jit(tx.init)(params)
    step = jnp.zeros((), jnp.int32)
    alpha, beta = pipeline.alpha, pipeline.beta

    def batch_at(rng):
        k1, k2 = jax.random.split(rng)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=args.frames_length))(speed)
        lat = ids_train[idx[:, None], pos]
        return {"latents": lat, "text": text_train[idx], "speed": speed}

    def loss_fn(params, batch, rng):
        terms = pipeline.loss_terms(params, batch, rng, train=True)
        final = terms["prediction"] + beta * terms["kl_loss"] + alpha * terms["speed_l2"]
        terms["final_loss"] = final
        return final, terms

    if args.bf16:
        # mixed precision: f32 master params, bf16 compute (matmuls/convs on
        # the MXU at 2x; reductions in the loss stay f32 via jnp promotion)
        base_loss = loss_fn

        from mage_tpu.training.mage_trainer import cast_floating

        def loss_fn(params, batch, rng):  # noqa: F811
            final, terms = base_loss(cast_floating(params, jnp.bfloat16), batch, rng)
            return final.astype(jnp.float32), jax.tree_util.tree_map(
                lambda v: v.astype(jnp.float32), terms
            )

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, step, rng, lr):
        def body(carry, _):
            params, opt_state, step, rng = carry
            rng, kb, kl = jax.random.split(rng, 3)
            batch = batch_at(kb)
            grads, terms = jax.grad(loss_fn, has_aux=True)(params, batch, kl)
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return (params, opt_state, step + 1, rng), terms["final_loss"]

        (params, opt_state, step, _), losses = jax.lax.scan(
            body, (params, opt_state, step, rng), None, length=args.chunk
        )
        return params, opt_state, step, jnp.mean(losses)

    n_val = int(ids_val.shape[0])
    eval_b = min(64, n_val)

    @jax.jit
    def eval_chunk(params, rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=args.frames_length))(speed)
        batch = {"latents": ids_val[idx[:, None], pos], "text": text_val[idx],
                 "speed": speed}
        terms = pipeline.loss_terms(params, batch, k3, train=False)
        return (terms["prediction"] + beta * terms["kl_loss"]
                + alpha * terms["speed_l2"]), terms["prediction"]

    steps_per_epoch = max(n // b, 1)
    chunks = max(round(steps_per_epoch / args.chunk), 1)
    rng = jax.random.PRNGKey(args.seed + 2)
    ckpt = Checkpointer(os.path.join(out_dir, "mage"))
    best = float("inf")
    start_epoch = 0
    resumed = try_restore_last(ckpt, {"params": params, "opt_state": opt_state,
                                      "step": step, "rng": rng})
    if resumed is not None:
        start_epoch, best, st = resumed
        params, opt_state = st["params"], st["opt_state"]
        step, rng = st["step"], st["rng"]
        print(f"stage-2 autoresume: epoch {start_epoch}, best {best:.4f}")
    t0 = time.time()
    for epoch in range(start_epoch, args.stage2_epochs):
        lr = epoch_lr(args.lr2, epoch, args.stage2_epochs, cos=True)
        for _ in range(chunks):
            rng, sub = jax.random.split(rng)
            params, opt_state, step, loss = train_chunk(params, opt_state, step, sub, lr)
        if epoch % 5 == 0 or epoch == args.stage2_epochs - 1:
            loss = float(jax.device_get(loss))
            val_loss, val_pred = map(float, jax.device_get(
                eval_chunk(params, jax.random.PRNGKey(args.seed + 3))
            ))
            log_metrics(out_dir, {
                "phase": "stage2", "epoch": epoch, "lr": lr, "train_loss": loss,
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
                           "step": step, "rng": rng})
    ckpt.save("final", {"step": jax.device_get(step),
                        "params": jax.device_get(params)})
    return params


def eval_generation(args, pipeline, params, dev, ids, split, out_dir):
    """AR-generate from val/train first frames; PSNR vs pixel ground truth
    (and vs the VQ recon upper bound); dump a few GIFs."""
    bank, d = dev["bank"], dev[split]
    g = min(args.eval_videos, int(ids.shape[0]))
    text = d["text"][:g]
    speed = jnp.full((g,), 0.5, jnp.float32)
    pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=args.frames_length))(speed)
    fs_vars = pipeline.first_stage.variables

    @jax.jit
    def run(params):
        lat0 = ids[:g, :1]  # stored frame 0 == clip frame 0 (pos[:,0] == 0)
        gen = pipeline.core.apply(
            {"params": params}, lat0, text, speed, method="generate_cached",
            rngs={"latent": jax.random.PRNGKey(7)},
        )
        video = pipeline.first_stage.decode(gen, variables=fs_vars)
        # ground-truth pixels for the same clips, composed on device.
        # Flat single-level composition: vmapping compose_clip over the
        # clip index nests a second vmap around compose_frames' internal
        # one, which XLA miscompiles (see tests/test_device_data.py
        # nested-vmap regression). Matches materialize_latents' call shape.
        L = pos.shape[1]
        rows = jnp.repeat(jnp.arange(g), L)
        cols = pos.reshape(-1)
        gt_flat = dd.compose_frames(
            bank, jnp.repeat(d["digit"][:g], L),
            d["ys"][rows, cols], d["xs"][rows, cols])
        gt = gt_flat.reshape(g, L, *gt_flat.shape[1:])
        recon_gt = pipeline.first_stage.decode(
            ids[:g][jnp.arange(g)[:, None], pos], variables=fs_vars
        )
        mse_gen = jnp.mean((video - gt[:, 1:]) ** 2)
        mse_recon = jnp.mean((recon_gt[:, 1:] - gt[:, 1:]) ** 2)
        return video, gt, mse_gen, mse_recon

    video, gt, mse_gen, mse_recon = run(params)
    mse_gen = float(jax.device_get(mse_gen))
    mse_recon = float(jax.device_get(mse_recon))
    log_metrics(out_dir, {
        "phase": f"generation_{split}", "samples": g,
        "gen_psnr_vs_gt": mse_to_psnr(mse_gen),
        "recon_psnr_vs_gt_upper_bound": mse_to_psnr(mse_recon),
    })
    few = np.asarray(jax.device_get(video[: args.gifs]))
    few_gt = np.asarray(jax.device_get(gt[: args.gifs]))
    os.makedirs(os.path.join(out_dir, "gifs"), exist_ok=True)
    for i in range(few.shape[0]):
        side = np.concatenate([few_gt[i, 1:], few[i]], axis=2) * 2.0  # GT | generated; x2: [-0.5,0.5] -> gif's [-1,1]
        save_gif(side, os.path.join(out_dir, "gifs", f"{split}_{i}.gif"))
    return mse_gen


def main(argv=None):
    args = parse_args(argv)
    if args.tiny:
        args.num_train, args.num_val = 64, 16
        args.dim, args.codebook = 16, 32
        args.stage1_epochs, args.stage2_epochs = 2, 2
        args.batch1, args.batch2, args.chunk = 8, 4, 2
        args.eval_videos, args.gifs = 4, 1
    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}")

    compact = dd.build_compact_single_mnist(
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
    if args.skip_stage1:
        tx = vt.make_tx(args.lr1)
        state = vt.create_state(model, jax.random.PRNGKey(args.seed),
                                jnp.zeros((1, 64, 64, 1)), tx)
        state = Checkpointer(os.path.join(args.out, "vqvae")).restore("best", state)
        state = jax.device_put(state)
    else:
        model, state = stage1(args, dev, args.out)

    fs_variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.skip_stage2:
        return
    t0 = time.time()
    ids_train = materialize_latents(args, model, state, dev, "train")
    ids_val = materialize_latents(args, model, state, dev, "val")
    ids_train.block_until_ready()
    log_metrics(args.out, {"phase": "latents", "train_shape": list(ids_train.shape),
                           "sec": time.time() - t0})

    pipeline = build_pipeline(args, fs_variables)
    params = stage2(args, pipeline, dev, ids_train, ids_val, args.out)
    eval_generation(args, pipeline, params, dev, ids_val, "val", args.out)
    eval_generation(args, pipeline, params, dev, ids_train, "train", args.out)


if __name__ == "__main__":
    main()
