"""FVD for a trained Moving-MNIST e2e run (closes BASELINE's "FVD/PSNR"
metric pair with an actual FVD scalar).

Restores the stage-1/stage-2 checkpoints a train_mnist_e2e.py run wrote,
regenerates the evaluation videos with the cached sampler, and computes
FVD(generated, ground truth) plus FVD(VQ reconstruction, ground truth) as
the first-stage calibration floor, through the in-repo I3D extractor.

No Kinetics I3D checkpoint ships in this offline image, so the extractor
runs with documented RANDOM weights (fixed seed 42) — a random-projection
Frechet distance: identical distributions give 0, and the recon floor is
reported for scale. Drop a pytorch-i3d ``rgb_imagenet.pt`` next to this
script to get the standard Kinetics-FVD instead (auto-detected).

Usage: python eval_fvd_e2e.py --run runs/mnist_e2e_full [--videos 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", default="runs/mnist_e2e_full")
    p.add_argument("--videos", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frames-length", type=int, default=16)
    p.add_argument("--out", default=None, help="default: <run>/e2e_metrics.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import train_mnist_e2e as e2e
    from mage_tpu.data import device_data as dd
    from mage_tpu.evals.fvd import compute_fvd, fvd_same_split_floor
    from mage_tpu.evals.i3d import I3D, import_i3d_torch, make_extractor
    from mage_tpu.models.vqvae import VectorQuantizedVAE
    from mage_tpu.training import vqvae_trainer as vt
    from mage_tpu.training.checkpoint import Checkpointer
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    targs = e2e.parse_args([
        "--out", args.run, "--seed", str(args.seed),
        "--frames-length", str(args.frames_length),
        "--eval-videos", str(args.videos),
    ])

    compact = dd.build_compact_single_mnist(
        targs.num_train, targs.num_val, targs.seed, targs.mnist_npz
    )
    dev = {
        "bank": dd.normalize_bank(compact["bank"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
    }

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=targs.dim,
                               K=targs.codebook)
    tx = vt.make_tx(targs.lr1)
    state = vt.create_state(model, jax.random.PRNGKey(targs.seed),
                            jnp.zeros((1, 64, 64, 1)), tx)
    state = Checkpointer(os.path.join(args.run, "vqvae")).restore("best", state)
    state = jax.device_put(state)
    fs_variables = {"params": state.params, "batch_stats": state.batch_stats}

    ids_val = e2e.materialize_latents(targs, model, state, dev, "val")
    pipeline = e2e.build_pipeline(targs, fs_variables)

    # stage-2 params: restore into the init template
    d = dev["val"]
    g = min(args.videos, int(ids_val.shape[0]))
    ctx = pipeline.core.text_context_length
    init_fn = jax.jit(
        lambda rngs, lat, txt, spd: pipeline.core.init(
            rngs, lat, txt, spd, train=True)["params"]
    )
    params = init_fn(
        {"params": jax.random.PRNGKey(targs.seed),
         "dropout": jax.random.PRNGKey(targs.seed),
         "latent": jax.random.PRNGKey(targs.seed)},
        jnp.zeros((1, targs.frames_length, *ids_val.shape[2:]), jnp.int32),
        jnp.zeros((1, ctx), jnp.int32), jnp.zeros((1,), jnp.float32),
    )
    mage_dir = os.path.join(args.run, "mage")
    # older runs saved only "final" (best-checkpointing landed later)
    name = "best" if os.path.isdir(os.path.join(mage_dir, "best")) else "final"
    restored = Checkpointer(mage_dir).restore(
        name, {"step": jnp.zeros((), jnp.int32), "params": jax.device_get(params)}
    )
    params = jax.device_put(restored["params"])

    text = d["text"][:g]
    speed = jnp.full((g,), 0.5, jnp.float32)
    pos = jax.vmap(lambda s: dd.clip_indices(
        s, frames_length=targs.frames_length))(speed)

    @jax.jit
    def run(params):
        lat0 = ids_val[:g, :1]
        gen = pipeline.core.apply(
            {"params": params}, lat0, text, speed, method="generate_cached",
            rngs={"latent": jax.random.PRNGKey(7)},
        )
        video = pipeline.first_stage.decode(gen, variables=fs_variables)
        # flat single-level composition (nested vmap around compose_frames'
        # internal one miscompiles under jit; see tests/test_device_data.py)
        L = pos.shape[1]
        rows = jnp.repeat(jnp.arange(g), L)
        cols = pos.reshape(-1)
        gt_flat = dd.compose_frames(
            dev["bank"], jnp.repeat(d["digit"][:g], L),
            d["ys"][rows, cols], d["xs"][rows, cols])
        gt = gt_flat.reshape(g, L, *gt_flat.shape[1:])
        recon = pipeline.first_stage.decode(
            ids_val[:g][jnp.arange(g)[:, None], pos], variables=fs_variables
        )
        return video, gt[:, 1:], recon[:, 1:]

    video, gt, recon = map(lambda a: np.asarray(jax.device_get(a)), run(params))

    torch_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "rgb_imagenet.pt")
    if os.path.exists(torch_ckpt):
        import torch

        variables = import_i3d_torch(torch.load(torch_ckpt, map_location="cpu"))
        provenance = "pytorch-i3d rgb_imagenet.pt (Kinetics)"
        endpoint, feature_dim = "logits", 400
        extractor = make_extractor(variables, batch_size=8,
                                   endpoint=endpoint)
    else:
        # trained extractor if a matching one exists, else the documented
        # random-init Mixed_3c fallback (evals/fvd.py::resolve_extractor)
        from mage_tpu.evals.fvd import resolve_extractor

        extractor, provenance, feature_dim = resolve_extractor(
            "MovingMNIST", batch_size=8)

    def to_rgb(v):
        # I3D expects float [-1, 1] (make_extractor contract)
        return np.repeat(2.0 * np.clip(v + 0.5, 0, 1) - 1.0, 3, axis=-1)

    fvd_gen = compute_fvd(to_rgb(gt), to_rgb(video), extractor)
    fvd_recon = compute_fvd(to_rgb(gt), to_rgb(recon), extractor)
    fvd_floor = fvd_same_split_floor(to_rgb(gt), extractor)
    mse = float(((video - gt) ** 2).mean())
    record = {
        "phase": "fvd_val", "samples": g,
        "fvd_gen_vs_gt": float(fvd_gen),
        "fvd_recon_vs_gt": float(fvd_recon),
        "fvd_same_split_floor": float(fvd_floor),
        "fvd_gen_over_floor": float(fvd_gen / max(fvd_floor, 1e-12)),
        "gen_psnr_vs_gt": float(10 * np.log10(1.0 / max(mse, 1e-12))),
        "extractor": provenance, "feature_dim": feature_dim,
        "time": time.time(),
    }
    out = args.out or os.path.join(args.run, "e2e_metrics.json")
    with open(out, "a") as fp:
        fp.write(json.dumps(record) + "\n")
    print("METRIC", json.dumps(record))


if __name__ == "__main__":
    main()
