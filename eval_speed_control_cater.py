"""Speed-control evaluation on a trained CATER MAGE model.

The reference conditions generation on a scalar speed: the dataloader
subsamples stored frames at interval ``1 + 1.4*speed``
(/root/reference/dataload.py:246-258, reused by the CATER loaders) and the
model adds ``speed * speed_embedding`` to the anchor before decoding
(/root/reference/modules/mage_model.py:611-613,652-658).
``eval_speed_control.py`` quantifies the resulting controllability on
Single Moving MNIST via digit-centroid tracking; this is the flagship-CATER
twin using dataset-agnostic signals only:

- **PSNR speed matrix**: generate the SAME first frame + caption at several
  speeds; PSNR each generation against the speed-MATCHED ground-truth
  subsampling and against every MISMATCHED one. Diagonal dominance means
  the model follows the requested speed rather than a default pace.
- **Motion-energy rate**: mean per-frame pixel change of generation vs GT
  at each speed (CATER scenes translate rigid sprites, so frame-difference
  energy rises with playback speed); correlation + monotonicity across
  speeds.

Runs from saved checkpoints only (no training). The dataset-shape args
(--dataset/--num-train/--num-val/--seed) must match the training run so the
procedural val split is identical:

    python eval_speed_control_cater.py --run runs/cater_e2e --videos 12
    python eval_speed_control_cater.py --run runs/cater9k --num-train 9000
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

import mage_tpu.training.vqvae_trainer as vt
import train_cater_e2e as tc
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.utils.media import save_gif


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", default="runs/cater_e2e")
    p.add_argument("--videos", type=int, default=12)
    p.add_argument("--speeds", type=float, nargs="+", default=[0.0, 0.5, 1.0])
    p.add_argument("--dataset", default="caterv2",
                   choices=["caterv1", "caterv2"])
    p.add_argument("--num-train", type=int, default=3000)
    p.add_argument("--num-val", type=int, default=600)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gifs", type=int, default=2)
    return p.parse_args(argv)


def load_run(args):
    """Rebuild the run's procedural dataset and restore both stages' best
    checkpoints, mirroring train_cater_e2e.main's eval-only path (kept
    separate so this script never touches the queue-critical trainer)."""
    a = tc.parse_args([
        "--out", args.run, "--dataset", args.dataset,
        "--num-train", str(args.num_train), "--num-val", str(args.num_val),
        "--seed", str(args.seed),
    ])
    if a.config is None:
        a.config = f"config/mage_{a.dataset}.yaml"
    dataset = "CATER-GEN-v1" if a.dataset == "caterv1" else "CATER-GEN-v2"
    ctx = 32 if a.dataset == "caterv1" else 38
    compact = cs.build_compact_cater(a.num_train, a.num_val, a.seed,
                                     dataset=dataset, context_length=ctx)
    norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0  # noqa: E731
    dev = {
        "bank": jnp.concatenate(
            [norm(compact["bank"][..., :3]),
             jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1),
        "background": norm(compact["background"]),
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()
                if k != "meta"},
    }
    model = VectorQuantizedVAE(input_dim=3, down_ratio=8, dim=a.dim,
                               K=a.codebook)
    state = vt.create_state(model, jax.random.PRNGKey(a.seed),
                            jnp.zeros((1, 128, 128, 3)), vt.make_tx(a.lr1))
    state = Checkpointer(os.path.join(args.run, "vqvae")).restore(
        "best", state)
    state = jax.device_put(state)
    fs_variables = {"params": state.params, "batch_stats": state.batch_stats}
    pipeline = tc.build_pipeline(a, fs_variables)
    params = tc.init_stage2_params(a, pipeline, (16, 16))
    restored = Checkpointer(os.path.join(args.run, "mage")).restore(
        "best", {"step": jnp.zeros((), jnp.int32),
                 "params": jax.device_get(params)})
    params = jax.device_put(restored["params"])
    return a, compact, dev, model, state, pipeline, params


def main(argv=None):
    args = parse_args(argv)
    print(f"devices: {jax.devices()}")
    a, compact, dev, model, state, pipeline, params = load_run(args)
    g = min(args.videos, int(dev["val"]["sid"].shape[0]))
    S = len(args.speeds)
    L = a.frames_length
    speeds = jnp.asarray(args.speeds, jnp.float32)
    fs_vars = pipeline.first_stage.variables
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def run(params):
        # shared first frame: clip_positions(s)[0] == 0 for every speed
        f0 = tc.frames_at(dev, "val", jnp.arange(g), jnp.zeros((g,), jnp.int32))
        lat0 = model.apply(variables, f0, method="encode",
                           mutable=False).astype(jnp.int32)[:, None]
        text = dev["val"]["text"][:g]
        # speed-major flat batch: block i holds all g scenes at speeds[i]
        gen = pipeline.core.apply(
            {"params": params},
            jnp.tile(lat0, (S, 1, 1, 1)), jnp.tile(text, (S, 1)),
            jnp.repeat(speeds, g), method="generate_cached",
            rngs={"latent": jax.random.PRNGKey(7)},
        )
        video = pipeline.first_stage.decode(gen, variables=fs_vars,
                                            max_chunk=128)
        video = video.reshape(S, g, L - 1, *video.shape[2:])
        # speed-matched GT subsamplings, flat single-level composition
        # (the nested-vmap form miscompiles on XLA:TPU — see CLAUDE.md)
        gts = []
        for i in range(S):
            pos = tc.clip_positions(speeds[i], L)
            gt = tc.frames_at(
                dev, "val", jnp.repeat(jnp.arange(g), L), jnp.tile(pos, (g,))
            ).reshape(g, L, 128, 128, 3)
            gts.append(gt[:, 1:])
        gt = jnp.stack(gts)  # (S, g, L-1, H, W, 3)
        # per-(gen speed, gt speed, scene) MSE + motion-energy rates
        mse = jnp.mean(
            (video[:, None] - gt[None, :]) ** 2, axis=(3, 4, 5, 6))
        gen_rate = jnp.mean(jnp.abs(jnp.diff(video, axis=2)), axis=(1, 2, 3, 4, 5))
        gt_rate = jnp.mean(jnp.abs(jnp.diff(gt, axis=2)), axis=(1, 2, 3, 4, 5))
        return mse, gen_rate, gt_rate, video[:, : args.gifs], gt[:, : args.gifs]

    mse, gen_rate, gt_rate, vid_gif, gt_gif = jax.device_get(run(params))
    # elementwise PSNR ([-1,1] pixels, range 2.0); tc.mse_to_psnr is scalar
    psnr = 10.0 * np.log10(4.0 / np.maximum(np.asarray(mse, np.float64),
                                            1e-12))  # (S_gen, S_gt, g)
    mat = psnr.mean(axis=-1)                         # (S_gen, S_gt)
    per_scene_match = (psnr.argmax(axis=1) == np.arange(S)[:, None])
    diag_margin = [float(mat[i, i] - np.delete(mat[i], i).max())
                   for i in range(S)]
    rate_corr = float(np.corrcoef(gen_rate, gt_rate)[0, 1]) if S > 1 else 1.0
    rec = {
        "phase": "speed_control", "videos": g,
        "speeds": [float(s) for s in args.speeds],
        "psnr_matrix": [[round(float(v), 3) for v in row] for row in mat],
        "psnr_diagonal_dominant": bool(
            (mat.argmax(axis=1) == np.arange(S)).all()),
        "diag_margin_db": [round(m, 3) for m in diag_margin],
        "per_scene_matched_frac": float(per_scene_match.mean()),
        "gen_motion_rate": [round(float(v), 5) for v in gen_rate],
        "gt_motion_rate": [round(float(v), 5) for v in gt_rate],
        "gen_gt_rate_correlation": round(rate_corr, 4),
        "gen_rate_monotonic": bool(np.all(np.diff(gen_rate) > 0)),
    }
    tc.log_metrics(args.run, rec)
    os.makedirs(os.path.join(args.run, "gifs"), exist_ok=True)
    for k in range(min(args.gifs, g)):
        # rows = speeds, columns = GT | generated
        side = np.concatenate([gt_gif[:, k], vid_gif[:, k]], axis=3)
        stacked = np.concatenate(list(side), axis=1).astype(np.float32)
        save_gif(stacked, os.path.join(args.run, "gifs",
                                       f"speed_control_{k}.gif"))
    print({k: v for k, v in rec.items() if k != "phase"})


if __name__ == "__main__":
    main()
