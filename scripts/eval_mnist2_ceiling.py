"""Recon-ceiling eval for a Modified-Double-MNIST stage-1 checkpoint.

VERDICT r4 #8: the mnist2 flagship stage-1 uses 7/512 codes and its
reconstruction ceilings (direction-acc 0.72, PSNR 30.7) bound every
downstream stage-2 metric. This script measures those ceilings for any
stage-1 run WITHOUT touching stage 2, so the codebook-restart arm
(runs/mnist2_cb) can be compared to the uniform arm (runs/mnist2_ab_u)
at stage-1 cost only:

  - val recon PSNR/SSIM + codebook occupancy (stage-1-style, frame 0 and a
    mid-motion frame)
  - eval-style ceilings on speed-subsampled clips: template-tracking the
    two captioned digits through first-stage RECONSTRUCTIONS of the GT
    latents — recon_direction_acc_ceiling / recon_track_error_px_ceiling /
    recon_motion_correct_ceiling, exactly the quantities the generation
    eval reports as its upper bounds (train_mnist2_e2e.py::eval_generation).

Usage:
  python scripts/eval_mnist2_ceiling.py --run runs/mnist2_cb \
      --num-train 8000 --num-val 2000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data import device_data as dd
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training import vqvae_trainer as vt
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.evals.metrics import ssim as np_ssim

import train_mnist2_e2e as m2

T_STORED = m2.T_STORED


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True,
                   help="run dir holding vqvae/<ckpt> from train_mnist2_e2e")
    p.add_argument("--ckpt", default="best")
    p.add_argument("--seed", type=int, default=0,
                   help="must match the training run's --seed (dataset RNG)")
    p.add_argument("--num-train", type=int, default=24000)
    p.add_argument("--num-val", type=int, default=6000)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--codebook", type=int, default=512)
    p.add_argument("--mnist-npz", default=None)
    p.add_argument("--videos", type=int, default=64,
                   help="val clips for the tracking-ceiling section")
    p.add_argument("--frames-length", type=int, default=16)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    print(f"devices: {jax.devices()}")

    compact = dd.build_compact_double_modified(
        args.num_train, args.num_val, args.seed, args.mnist_npz
    )
    dev = {
        "bank": dd.normalize_bank(compact["bank"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
    }

    model = VectorQuantizedVAE(
        input_dim=1, down_ratio=4, dim=args.dim, K=args.codebook
    )
    state = vt.create_state(
        model, jax.random.PRNGKey(args.seed), jnp.zeros((1, 64, 64, 1)),
        vt.make_tx(1e-4),
    )
    state = Checkpointer(os.path.join(args.run, "vqvae")).restore(
        args.ckpt, state)
    state = jax.device_put(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # --- stage-1-style recon metrics (frame 0 + mid-motion frame) ---------
    n_val = int(dev["val"]["d1"].shape[0])
    eval_b = min(512, n_val)

    @jax.jit
    def eval_recon(frame_idx):
        s = jnp.arange(eval_b)
        frames = m2.frames_at(dev, "val", s,
                              jnp.broadcast_to(frame_idx, (eval_b,)))
        ids = model.apply(variables, frames, method="encode", mutable=False)
        recon = model.apply(variables, ids, method="decode", mutable=False)
        used = jnp.unique(ids, size=args.codebook, fill_value=-1)
        return jnp.mean((recon - frames) ** 2), jnp.sum(used >= 0), frames, recon

    mse0, used0, frames, recon = eval_recon(jnp.int32(0))
    mse_m, used_m, _, _ = eval_recon(jnp.int32(T_STORED // 2))
    mse0 = float(jax.device_get(mse0))
    mse_m = float(jax.device_get(mse_m))
    f_np = np.asarray(jax.device_get(frames[:32]))[..., 0]
    r_np = np.asarray(jax.device_get(recon[:32]))[..., 0]
    ssim_val = float(np.mean([np_ssim(a, b, data_range=1.0)
                              for a, b in zip(f_np, r_np)]))
    rec = {
        "phase": "recon_ceiling_stage1", "run": args.run, "ckpt": args.ckpt,
        "val_recon_mse": mse0, "val_recon_psnr": m2.mse_to_psnr(mse0),
        "val_recon_psnr_motion": m2.mse_to_psnr(mse_m),
        "val_ssim": ssim_val,
        "codebook_used": int(jax.device_get(used0)),
        "codebook_used_motion": int(jax.device_get(used_m)),
    }
    m2.log_metrics(args.run, rec)

    # --- eval-style tracking ceilings on reconstructions ------------------
    g = min(args.videos, n_val)
    d = dev["val"]
    speed = jnp.full((g,), 0.5, jnp.float32)
    pos = jax.vmap(
        lambda s, ln: dd.clip_indices_var(s, ln, args.frames_length)
    )(speed, d["length"][:g])

    @jax.jit
    def recon_clips():
        L = pos.shape[1]
        # flat single-level composition (nested-vmap XLA bug — CLAUDE.md)
        gt_flat = m2.frames_at(dev, "val", jnp.repeat(jnp.arange(g), L),
                               pos.reshape(-1))
        gt = gt_flat.reshape(g, L, *gt_flat.shape[1:])
        flat = gt.reshape(g * L, *gt.shape[2:])
        ids = model.apply(variables, flat, method="encode", mutable=False)
        rec = model.apply(variables, ids, method="decode", mutable=False)
        rec = rec.reshape(g, L, *rec.shape[1:])
        mse = jnp.mean((rec[:, 1:] - gt[:, 1:]) ** 2)
        return rec, gt, mse

    recs, gt, mse_recon = recon_clips()
    mse_recon = float(jax.device_get(mse_recon))
    recon_np = np.asarray(jax.device_get(recs))[:, 1:, ..., 0]
    dev_host = {k: np.asarray(jax.device_get(v))
                for k, v in d.items() if k != "text"}
    bank_np = np.asarray(jax.device_get(dev["bank"]))
    pos_np = np.asarray(jax.device_get(pos))
    mm_ceil = m2.motion_metrics(recon_np, dev_host, bank_np,
                                np.arange(g), pos_np)
    m2.log_metrics(args.run, {
        "phase": "recon_ceiling_tracking", "samples": g,
        "recon_psnr_vs_gt_upper_bound": m2.mse_to_psnr(mse_recon),
        "recon_motion_correct_ceiling": mm_ceil["motion_correct_frac"],
        "recon_track_error_px_ceiling": mm_ceil["mean_track_error_px"],
        "recon_direction_acc_ceiling": mm_ceil["initial_direction_acc"],
        "direction_cases": mm_ceil["direction_cases"],
    })


if __name__ == "__main__":
    main()
