"""Speed-control evaluation on a trained Single Moving MNIST model.

The reference conditions generation on a scalar speed: at data level the
speed sets the temporal subsampling interval of the source trajectory
(/root/reference/dataload.py:246-258), and at model level the anchor gets
``speed * speed_embedding`` added before decoding
(/root/reference/modules/mage_model.py:611-613,652-658).  This script
quantifies whether the trained model's generations actually track the
requested speed — the "controllable" in controllable image-to-video:

- generate the SAME first frame + caption at several speeds in one batch;
- PSNR each generation against the speed-MATCHED ground-truth subsampling
  and against every MISMATCHED one (diagonal dominance = real control);
- compare digit centroid displacement per frame (motion rate) of the
  generations against ground truth at each speed.

Runs from the saved checkpoints only (no training):

    python eval_speed_control.py --run runs/mnist_e2e_full --videos 16

CPU-friendly (everything is passed as jit arguments, nothing constant-folds
the dataset); on the chip the whole sweep is a few seconds.
"""
import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

import mage_tpu.data.device_data as dd
import mage_tpu.training.vqvae_trainer as vt
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.utils.media import save_gif

from train_mnist_e2e import build_pipeline, parse_args as e2e_parse_args


def centroid_track(video: jax.Array, thresh: float = 0.15) -> jax.Array:
    """Per-frame digit centroid (px) of a (B,T,H,W,1) clip in [-0.5, 0.5]
    -> (B,T,2). Weights are THRESHOLDED intensities: generated backgrounds
    carry small positive decode noise over ~4k pixels, which un-thresholded
    drags the centroid toward frame center and fakes a slow digit."""
    w = jnp.clip(video[..., 0] + 0.5 - thresh, 0.0, None)  # (B,T,H,W)
    tot = jnp.sum(w, axis=(-1, -2)) + 1e-6
    ys = jnp.arange(video.shape[2], dtype=jnp.float32)
    xs = jnp.arange(video.shape[3], dtype=jnp.float32)
    cy = jnp.sum(w * ys[:, None], axis=(-1, -2)) / tot  # (B,T)
    cx = jnp.sum(w * xs[None, :], axis=(-1, -2)) / tot
    return jnp.stack([cy, cx], axis=-1)


def masked_speed(track: jax.Array, valid: jax.Array) -> jax.Array:
    """Mean per-frame centroid displacement over the VALID prefix.

    track (B,T,2); valid (T-1,) marks diffs between real (non-padded)
    frames — high speeds pad by repeating the last picked frame
    (dataload.py:256-258), whose zero diffs would deflate the mean."""
    d = jnp.sqrt(jnp.sum(jnp.diff(track, axis=1) ** 2, axis=-1))  # (B,T-1)
    return jnp.sum(d * valid, axis=1) / jnp.maximum(valid.sum(), 1.0)


def mse_to_psnr(mse: jax.Array) -> jax.Array:
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs/mnist_e2e_full")
    p.add_argument("--videos", type=int, default=16)
    p.add_argument("--speeds", type=float, nargs="+",
                   default=[0.05, 0.275, 0.5, 0.725, 0.95])
    p.add_argument("--ckpt", default="final", help="mage checkpoint name")
    p.add_argument("--gifs", type=int, default=2,
                   help="clips to dump as per-speed GIF strips")
    args = p.parse_args(argv)

    # Rebuild the run's dataset (same seed/counts as the training defaults
    # so the val split is identical), restore both stages.
    targs = e2e_parse_args(["--out", args.run])
    compact = dd.build_compact_single_mnist(
        targs.num_train, targs.num_val, targs.seed, targs.mnist_npz
    )
    bank = dd.normalize_bank(compact["bank"])
    val = {k: jnp.asarray(v) for k, v in compact["val"].items()}
    G, S = args.videos, len(args.speeds)

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4,
                               dim=targs.dim, K=targs.codebook)
    state = vt.create_state(model, jax.random.PRNGKey(targs.seed),
                            jnp.zeros((1, 64, 64, 1)), vt.make_tx(targs.lr1))
    state = Checkpointer(os.path.join(args.run, "vqvae")).restore("best", state)
    fs_vars = {"params": state.params, "batch_stats": state.batch_stats}

    pipeline = build_pipeline(targs, fs_vars)
    tmpl = jax.jit(
        lambda: pipeline.core.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
             "latent": jax.random.PRNGKey(0)},
            jnp.zeros((1, targs.frames_length, 16, 16), jnp.int32),
            jnp.zeros((1, pipeline.core.text_context_length), jnp.int32),
            jnp.zeros((1,), jnp.float32),
            train=True,
        )["params"]
    )()
    params = Checkpointer(os.path.join(args.run, "mage")).restore(
        args.ckpt, {"step": 0, "params": tmpl}
    )["params"]

    L = targs.frames_length
    speeds = jnp.asarray(args.speeds, jnp.float32)

    @jax.jit
    def run(params, fs_vars, bank, digit, ys, xs, text):
        # frame 0 of every clip (pos[0] == 0 at every speed)
        f0 = dd.compose_frames(bank, digit, ys[:, 0], xs[:, 0])
        lat0 = model.apply(fs_vars, f0, method="encode",
                           mutable=False).astype(jnp.int32)[:, None]
        # tile across speeds -> one batched generate (one compile)
        lat0_t = jnp.tile(lat0, (S, 1, 1, 1))
        text_t = jnp.tile(text, (S, 1))
        speed_t = jnp.repeat(speeds, G)
        gen = pipeline.core.apply(
            {"params": params}, lat0_t, text_t, speed_t,
            method="generate_cached", rngs={"latent": jax.random.PRNGKey(7)},
        )
        video = pipeline.first_stage.decode(gen, variables=fs_vars)
        video = video.reshape(S, G, L - 1, *video.shape[2:])

        # ground truth + its VQ recon ceiling at every speed
        def gt_at(s):
            # flat single-level composition (nested vmap around
            # compose_frames' internal one miscompiles under jit; see
            # tests/test_device_data.py nested-vmap regression)
            pos = dd.clip_indices(jnp.asarray(s), frames_length=L)
            rows = jnp.repeat(jnp.arange(G), L)
            cols = jnp.tile(pos, G)
            flat = dd.compose_frames(bank, jnp.repeat(digit[:G], L),
                                     ys[rows, cols], xs[rows, cols])
            return flat.reshape(G, L, *flat.shape[1:])
        gt = jnp.stack([gt_at(s) for s in args.speeds])  # (S,G,L,64,64,1)
        flat = gt[:, :, 1:].reshape(-1, 64, 64, 1)
        rec = model.apply(fs_vars, model.apply(fs_vars, flat, method="encode",
                                               mutable=False),
                          method="decode", mutable=False)
        rec = rec.reshape(S, G, L - 1, 64, 64, 1)

        # PSNR confusion matrix: generation at speed i vs GT at speed j
        mat = jnp.stack([
            jnp.stack([
                mse_to_psnr(jnp.mean((video[i] - gt[j, :, 1:]) ** 2))
                for j in range(S)
            ]) for i in range(S)
        ])
        # context: how similar the GT clips at different speeds are to each
        # other (same trajectory, different subsampling) — the scale against
        # which diagonal dominance must be judged
        gt_cross = jnp.stack([
            jnp.stack([
                mse_to_psnr(jnp.mean((gt[i, :, 1:] - gt[j, :, 1:]) ** 2))
                for j in range(S)
            ]) for i in range(S)
        ])
        # where matched-speed generation diverges over time
        per_frame_matched = jnp.stack([
            mse_to_psnr(jnp.mean((video[i] - gt[i, :, 1:]) ** 2,
                                 axis=(0, 2, 3, 4)))
            for i in range(S)
        ])  # (S, L-1)
        ceiling = jnp.stack([
            mse_to_psnr(jnp.mean((rec[i] - gt[i, :, 1:]) ** 2))
            for i in range(S)
        ])

        # thresholded centroid tracks over generated frames 1..L-1
        tr_gen = jnp.stack([centroid_track(video[i]) for i in range(S)])
        tr_gt = jnp.stack([centroid_track(gt[i, :, 1:]) for i in range(S)])
        valids = jnp.stack([
            (jnp.diff(dd.clip_indices(jnp.asarray(s), frames_length=L)[1:])
             != 0).astype(jnp.float32)
            for s in args.speeds
        ])  # (S, L-2) non-padded diffs among frames 1..L-1
        sp_gen = jnp.stack([jnp.mean(masked_speed(tr_gen[i], valids[i]))
                            for i in range(S)])
        sp_gt = jnp.stack([jnp.mean(masked_speed(tr_gt[i], valids[i]))
                           for i in range(S)])
        # centroid-track position error: generation at speed i vs GT at j
        pos_err = jnp.stack([
            jnp.stack([
                jnp.mean(jnp.sqrt(jnp.sum((tr_gen[i] - tr_gt[j]) ** 2, -1)))
                for j in range(S)
            ]) for i in range(S)
        ])
        return (video, gt, mat, gt_cross, per_frame_matched, ceiling,
                sp_gen, sp_gt, pos_err)

    out = run(params, fs_vars, bank, val["digit"][:G], val["ys"][:G],
              val["xs"][:G], val["text"][:G])
    (video, gt, mat, gt_cross, per_frame_matched, ceiling, sp_gen, sp_gt,
     pos_err) = map(jax.device_get, out)

    diag = np.diag(mat)
    off = (mat.sum(1) - diag) / (S - 1)
    pdiag = np.diag(pos_err)
    report = {
        "run": args.run, "videos": G, "speeds": args.speeds,
        "psnr_matrix_gen_x_gt": np.round(mat, 3).tolist(),
        "psnr_matched": np.round(diag, 3).tolist(),
        "psnr_mismatched_mean": np.round(off, 3).tolist(),
        "recon_ceiling_matched": np.round(ceiling, 3).tolist(),
        "gt_cross_speed_psnr": np.round(gt_cross, 3).tolist(),
        "per_frame_psnr_matched": np.round(per_frame_matched, 2).tolist(),
        "pos_err_px_gen_x_gt": np.round(pos_err, 3).tolist(),
        "pos_err_matched": np.round(pdiag, 3).tolist(),
        "centroid_px_per_frame_gen": np.round(sp_gen, 3).tolist(),
        "centroid_px_per_frame_gt": np.round(sp_gt, 3).tolist(),
        "psnr_diagonal_dominant": bool((diag >= mat.max(1) - 1e-6).all()),
        "pos_err_diagonal_dominant": bool(
            (pdiag <= pos_err.min(1) + 1e-6).all()),
        "gen_speed_monotonic": bool(np.all(np.diff(sp_gen) > 0)),
        "gen_gt_rate_correlation": float(np.corrcoef(sp_gen, sp_gt)[0, 1]),
    }
    path = os.path.join(args.run, "speed_control_metrics.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))

    gif_dir = os.path.join(args.run, "gifs")
    os.makedirs(gif_dir, exist_ok=True)
    for i in range(min(args.gifs, G)):
        # rows top->bottom = increasing speed; left = GT, right = generated
        strip = np.concatenate(
            [np.concatenate([gt[s, i, 1:], video[s, i]], axis=2)
             for s in range(S)], axis=1)
        save_gif(strip, os.path.join(gif_dir, f"speed_sweep_{i}.gif"))
    print(f"wrote {path} and {min(args.gifs, G)} sweep gifs")


if __name__ == "__main__":
    main()
