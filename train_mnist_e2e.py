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

The training loops live in mage_tpu/training/e2e.py (shared by all five
e2e chains); this driver supplies the MNIST-specific pieces: on-device
frame composition, speed-conditioned clip indices, and the generation
eval.

Usage (real chip):
    python train_mnist_e2e.py --out runs/mnist_e2e
Smoke (CPU):
    python train_mnist_e2e.py --tiny --out /tmp/e2e_smoke
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
from mage_tpu.utils.media import save_gif

log_metrics = e2e.log_metrics
mse_to_psnr = e2e.mse_to_psnr


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


def frames_at(dev, split, idx, t):
    """Compose frames (len(idx),) x stored-frame t on device."""
    d = dev[split]
    return dd.compose_frames(dev["bank"], d["digit"][idx],
                             d["ys"][idx, t], d["xs"][idx, t])


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
        t_store=dd.SEQ_LENGTH,
        n_train=int(dev["train"]["digit"].shape[0]),
        n_val=int(dev["val"]["digit"].shape[0]),
        input_shape=(64, 64, 1),
        out_dir=out_dir,
        eval_cap=512,
        ssim_count=args.eval_videos,
        data_range=1.0,
    )
    return model, state


def materialize_latents(args, model, state, dev, split):
    """Encode every stored frame of ``split`` -> resident ids (N, 20, h, w)."""
    d = dev[split]
    n = int(d["digit"].shape[0])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def encode_chunk(idx):
        c = idx.shape[0]
        flat_idx = jnp.repeat(idx, dd.SEQ_LENGTH)
        t = jnp.tile(jnp.arange(dd.SEQ_LENGTH), c)
        frames = frames_at(dev, split, flat_idx, t)
        ids = model.apply(variables, frames, method="encode", mutable=False)
        return ids.reshape(c, dd.SEQ_LENGTH, *ids.shape[1:]).astype(jnp.int32)

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
    # pass the trained first-stage variables directly (not through the config
    # merge, which deep-copies — these are device arrays)
    from mage_tpu.models.pipeline import MagePipeline

    return MagePipeline(first_stage_variables=fs_variables,
                        **cfg.model.params.to_dict())


def stage2(args, pipeline, dev, ids_train, ids_val, out_dir):
    b = args.batch2
    n = int(ids_train.shape[0])
    n_val = int(ids_val.shape[0])
    eval_b = min(64, n_val)

    def batch_at(rng, ids, text):
        k1, k2 = jax.random.split(rng)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(lambda s: dd.clip_indices(
            s, frames_length=args.frames_length))(speed)
        lat = ids[idx[:, None], pos]
        return {"latents": lat, "text": text[idx], "speed": speed}

    def val_batch_at(rng, ids, text):
        k1, k2, k3 = jax.random.split(rng, 3)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(lambda s: dd.clip_indices(
            s, frames_length=args.frames_length))(speed)
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
    )


def eval_generation(args, pipeline, params, dev, ids, split, out_dir):
    """AR-generate from val/train first frames; PSNR vs pixel ground truth
    (and vs the VQ recon upper bound); dump a few GIFs."""
    d = dev[split]
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
        gt_flat = frames_at(dev, split, jnp.repeat(jnp.arange(g), L),
                            pos.reshape(-1))
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
