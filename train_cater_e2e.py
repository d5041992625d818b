"""End-to-end CATER-GEN-v2-scale training on the synthetic stand-in.

The real CATER-GEN-v2 videos are Blender renders unavailable offline
(reference README.md:29-37); this drives the FLAGSHIP recipe — VQ-VAE f8
at 128x128 (train_vqvae.py --dataset cater_gen) and the stage-2 MAGE of
config/mage_caterv2.yaml (d=512, 6 axial layers, 16x16 latents, K=512,
frames_length 10, speed conditioning, explicit two-clause attribute
captions) — on procedurally rendered CATER scenes with the reference's
action set (generators/cater_synthetic.py).

Same resident-data strategy as train_mnist2_e2e.py (the tunneled chip
moves ~0.5 MB/s host<->device): upload the sprite bank + integer per-frame
placements + caption tokens (~15 MB), compose 128px frames on device,
train stage 1 -> materialize per-frame latent ids -> train stage 2 ->
evaluate AR generation PSNR plus tracking-based Action / Referring
precision (the eval_precision.py metric pair, measured directly on the
generated pixels by normalized-cross-correlation sprite tracking instead
of an external SwinBERT captioner, reference README.md:9-16).

The training loops live in mage_tpu/training/e2e.py (shared by all five
e2e chains); this driver supplies the CATER-specific pieces.

Usage (real chip):
    python train_cater_e2e.py --out runs/cater_e2e --bf16
Smoke (CPU):
    python train_cater_e2e.py --tiny --out /tmp/cater_smoke
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data import device_data as dd
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training import e2e
from mage_tpu.training import vqvae_trainer as vt
from mage_tpu.training.checkpoint import Checkpointer

T_STORE = cs.T_STORE  # 24 stored frames per clip
log_metrics = e2e.log_metrics


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/cater_e2e")
    p.add_argument("--dataset", default="caterv2",
                   choices=["caterv1", "caterv2"],
                   help="caterv1: two-object {cone, snitch} scenes, "
                        "30-token shape-only vocabulary, "
                        "config/mage_caterv1.yaml")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-train", type=int, default=3000)
    p.add_argument("--num-val", type=int, default=600)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--codebook", type=int, default=512)
    p.add_argument("--stage1-epochs", type=int, default=80)
    p.add_argument("--batch1", type=int, default=64)
    p.add_argument("--lr1", type=float, default=1e-4)
    p.add_argument("--beta1", type=float, default=2.0)
    p.add_argument("--config", default=None,
                   help="stage-2 YAML (default: config/mage_{dataset}.yaml)")
    p.add_argument("--stage2-epochs", type=int, default=40)
    p.add_argument("--batch2", type=int, default=16)
    p.add_argument("--lr2", type=float, default=5e-5)
    p.add_argument("--frames-length", type=int, default=10)
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--skip-stage1", action="store_true")
    p.add_argument("--skip-stage2", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--eval-videos", type=int, default=48)
    p.add_argument("--gifs", type=int, default=6)
    p.add_argument("--codebook-restart", action="store_true",
                   help="re-seed dead codebook entries every other epoch "
                        "from encoder features (the flagship stage-1 run "
                        "used 37/512 codes and motion-frame recon trailed "
                        "frame-0 recon by 10 dB; off = reference parity)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    if args.tiny:
        # shrink every knob the user did not explicitly set, so e.g.
        # `--tiny --stage2-epochs 12` still honors the explicit epochs
        # (the autoresume test depends on this)
        for k, v in dict(num_train=48, num_val=12, dim=16, codebook=32,
                         stage1_epochs=2, stage2_epochs=2, batch1=8,
                         batch2=4, chunk=2, eval_videos=4, gifs=1).items():
            if getattr(args, k) == p.get_default(k):
                setattr(args, k, v)
    return args


def mse_to_psnr(mse, data_range=2.0):
    """Pixels are in [-1, 1] (the CATER transform chain's Normalize(.5,.5))."""
    return e2e.mse_to_psnr(mse, data_range)


def frames_at(dev, split, idx, t):
    """Compose (len(idx),) frames, video idx x stored-frame t, on device."""
    d = dev[split]
    return dd.compose_frames_cater(
        dev["bank"], dev["background"],
        d["sid"][idx, t], d["top"][idx, t], d["left"][idx, t],
    )


def clip_positions(speed, frames_length):
    """Speed-conditioned stored-frame indices (interval 1 + 1.4*speed, so
    count = round(24/interval) >= frames_length: no padding needed).
    Same linspace-floor integer math as device_data.clip_indices."""
    q = T_STORE / (1.0 + 1.4 * speed.astype(jnp.float32))
    count = jnp.maximum(jnp.round(q).astype(jnp.int32), frames_length)
    i = jnp.arange(frames_length, dtype=jnp.int32)
    return (i * (T_STORE - 1)) // jnp.maximum(count - 1, 1)


# ---------------------------------------------------------------------------
# Stage 1 / latents / stage 2: shared loops (mage_tpu/training/e2e.py)
# ---------------------------------------------------------------------------


def stage1(args, dev, out_dir):
    model = VectorQuantizedVAE(
        input_dim=3, down_ratio=8, dim=args.dim, K=args.codebook
    )
    state = e2e.run_vqvae_stage1(
        args, model,
        frames_at=lambda split, idx, t: frames_at(dev, split, idx, t),
        t_store=T_STORE,
        n_train=int(dev["train"]["sid"].shape[0]),
        n_val=int(dev["val"]["sid"].shape[0]),
        input_shape=(128, 128, 3),
        out_dir=out_dir,
        eval_cap=128,
        # mid-action frame: sprites at off-grid offsets, rotation phases,
        # z-lift — the content whose recon bounds generation
        motion_frame=T_STORE // 2,
        ssim_count=32,
        data_range=2.0,
    )
    return model, state


def materialize_latents(args, model, state, dev, split):
    """Encode all stored frames of every clip -> ids (N, T_STORE, 16, 16).

    chunk x T_STORE frames run per dispatch; 25 clips (600 128px frames)
    OOM'd the single chip at 21.3 of 15.75 GB HBM — the f32 encoder tops
    out ~16 MB of activations per frame at the 128^2 x dim level."""
    n = int(dev[split]["sid"].shape[0])
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def encode_chunk(idx):
        c = idx.shape[0]
        flat_idx = jnp.repeat(idx, T_STORE)
        t = jnp.tile(jnp.arange(T_STORE), c)
        frames = frames_at(dev, split, flat_idx, t)
        ids = model.apply(variables, frames, method="encode", mutable=False)
        return ids.reshape(c, T_STORE, *ids.shape[1:]).astype(jnp.int32)

    return e2e.materialize(n, 5, encode_chunk)


def build_pipeline(args, fs_variables):
    from mage_tpu.config import load_config

    cfg = load_config(args.config)
    cfg.model.params.first_stage_config.params.pop("ckpt_path", None)
    cfg.model.params.first_stage_config.params.dim = args.dim
    cfg.model.params.first_stage_config.params.K = args.codebook
    cfg.model.params.codebook_size = args.codebook
    cfg.model.params.randomness = False  # explicit captions (caterv2 yaml
    cfg.model.params.beta = 0.0          # pairs randomness with ambiguous)
    cfg.model.params.frames_length = args.frames_length
    cfg.model.params.generate_decoder_config.params.frames_length = args.frames_length
    cfg.model.params.generate_decoder_config.params.out_channels = args.codebook
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


def init_stage2_params(args, pipeline, latent_hw):
    return e2e.init_stage2_params(pipeline, args.seed, args.frames_length,
                                  tuple(latent_hw), jnp.int32)


def stage2(args, pipeline, dev, ids_train, ids_val, out_dir):
    b = args.batch2
    n = int(ids_train.shape[0])
    n_val = int(ids_val.shape[0])
    eval_b = min(64, n_val)

    def batch_at(rng, ids, text):
        k1, k2 = jax.random.split(rng)
        idx = jax.random.randint(k1, (b,), 0, n)
        speed = jax.random.uniform(k2, (b,))
        pos = jax.vmap(lambda s: clip_positions(s, args.frames_length))(speed)
        lat = ids[idx[:, None], pos]
        return {"latents": lat, "text": text[idx], "speed": speed}

    def val_batch_at(rng, ids, text):
        k1, k2, k3 = jax.random.split(rng, 3)
        idx = jax.random.randint(k1, (eval_b,), 0, n_val)
        speed = jax.random.uniform(k2, (eval_b,))
        pos = jax.vmap(lambda s: clip_positions(s, args.frames_length))(speed)
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


# ---------------------------------------------------------------------------
# Evaluation: PSNR + tracking-based Action / Referring precision
# ---------------------------------------------------------------------------


def _ncc_near(frame: np.ndarray, tmpl: np.ndarray, mask: np.ndarray,
              top: int, left: int, radius: int) -> float:
    """Masked zero-mean normalized cross-correlation of the (32, 32, 3)
    sprite template against every window of ``frame`` whose top-left lies
    within ``radius`` of (top, left) -> best score. Localized: the metric
    only ever queries near an expected position, so computing the full
    (H-31, W-31) map would be ~20x wasted work."""
    from numpy.lib.stride_tricks import sliding_window_view

    y0 = max(top - radius, 0)
    x0 = max(left - radius, 0)
    y1 = min(top + radius + 1, frame.shape[0] - 31)
    x1 = min(left + radius + 1, frame.shape[1] - 31)
    if y0 >= y1 or x0 >= x1:
        return -1.0
    crop = frame[y0 : y1 + 31, x0 : x1 + 31].astype(np.float64)

    m = mask.astype(np.float64)
    k = max(m.sum(), 1.0)
    t0 = tmpl.astype(np.float64) * m[..., None]
    tmean = t0.sum((0, 1)) / k  # per-channel masked template mean
    t = t0 - tmean * m[..., None]
    tn = np.sqrt((t**2).sum())
    wins = sliding_window_view(crop, (32, 32), axis=(0, 1))  # (Y, X, 3, 32, 32)
    mt = np.moveaxis(t, -1, 0)  # (3, 32, 32)
    dot = np.einsum("yxchw,chw->yx", wins, mt, optimize=True)
    s1 = np.einsum("yxchw,hw->yxc", wins, m, optimize=True)
    s2 = np.einsum("yxchw,hw->yxc", wins**2, m, optimize=True)
    var = np.maximum(s2 - s1**2 / k, 0.0).sum(-1)  # float error -> tiny neg
    ncc = dot / np.maximum(np.sqrt(var) * tn, 1e-9)
    # NCC alone misfires two ways: a near-flat window (departed object ->
    # plain background) has var ~ 0 and the normalization explodes past 1,
    # and any shaded sprite correlates with any other via the shared
    # lambertian ramp. Gate on real contrast (masked per-pixel RMS >= 5
    # gray levels) and on color identity (masked mean within 45/channel of
    # the template's).
    contrast_ok = np.sqrt(var / (3.0 * k)) >= 5.0
    color_ok = np.abs(s1 / k - tmean).mean(-1) <= 45.0
    smap = np.where(contrast_ok & color_ok, ncc, 0.0)
    return float(smap.max())


def precision_metrics(videos: np.ndarray, metas: list, bank_index: dict,
                      bank_arr: np.ndarray, tau: float = 0.45,
                      radius: int = 10, quadrant_level: bool = False) -> dict:
    """Action / Referring precision of (G, L, 128, 128, 3) videos in
    [-1, 1] against their scene metadata (eval_precision.py's metric pair,
    measured by sprite tracking on the pixels).

    Per mover: action signature on the LAST frame — destination presence
    (slide/pick-place/contain), start-position departure, containment
    occlusion of the target, rotation stay-in-place — scored by masked NCC
    against the object's sprite (max over rotation phases).

    ``quadrant_level=True`` scores slide/pick-place destinations at the
    captioned QUADRANT (search the whole 46-px quadrant around its center)
    instead of the metadata's exact endpoint — the correct target for
    ambiguous-mode captions ("to the fourth quadrant"), where any endpoint
    inside the quadrant satisfies the text (reference annotation grammar,
    gen_cater_text_anno find_quadrant). Containment keeps the exact check:
    its destination is the visible target object, determined regardless of
    caption mode."""
    acts, refs = [], []
    by_action: dict = {}
    for vid, meta in zip(videos, metas):
        frame_last = (vid[-1] + 1.0) * 127.5
        by_name = {o["instance"]: o for o in meta["objects"]}

        def templates(o):
            keys = [(o["shape"], o["size"], o["color"], o["material"], p)
                    for p in range(cs.N_PHASES)]
            idxs = [bank_index[k] for k in keys if k in bank_index]
            return [bank_arr[i] for i in idxs]

        def best_near(frame, o, pos, radius=radius):
            top, left = cs.world_to_topleft(*pos)
            best = -1.0
            for spr in templates(o):
                best = max(best, _ncc_near(
                    frame, spr[..., :3].astype(np.float64), spr[..., 3] > 0,
                    top, left, radius))
            return best

        for name, items in meta["movements"].items():
            if not items:
                continue
            action, target, _s, _e = items[0]
            o = by_name[name]
            start = o["locations"]["0"][:2]
            end = o["locations"]["1"][:2]
            at_end = best_near(frame_last, o, (end[0], end[1], 0.0))
            at_start = best_near(frame_last, o, (start[0], start[1], 0.0))
            if action == "_rotate":
                ok = at_start >= tau
                acts.append(ok)
            elif action == "_contain":
                tgt = by_name[target]
                tpos = tgt["locations"]["1"][:2]
                tgt_visible = best_near(frame_last, tgt,
                                        (tpos[0], tpos[1], 0.0))
                ok = at_end >= tau and tgt_visible < tau
                acts.append(ok)
                refs.append(at_end >= tau)
            else:  # _slide / _pick_place: moved to destination, left start
                if quadrant_level:
                    qc = (1.5 if end[0] >= 0 else -1.5,
                          1.5 if end[1] >= 0 else -1.5)
                    at_end = best_near(frame_last, o, (qc[0], qc[1], 0.0),
                                       radius=26)
                ok = at_end >= tau and (
                    at_start < tau
                    or np.hypot(end[0] - start[0], end[1] - start[1]) < 1.0
                )
                acts.append(ok)
                refs.append(at_end >= tau)
            by_action.setdefault(action, []).append(ok)
    return {
        "action_precision": float(np.mean(acts)) if acts else 0.0,
        "referring_precision": float(np.mean(refs)) if refs else 0.0,
        "action_cases": len(acts),
        "referring_cases": len(refs),
        # which semantics fail, not just how many: per-action-type
        # precision (counts in *_cases) localizes gen failures to e.g.
        # containment vs slide endpoints when tuning the stage-2 recipe
        "per_action": {
            k: [float(np.mean(v)), len(v)] for k, v in sorted(by_action.items())
        },
    }


def eval_generation(args, pipeline, params, dev, compact, ids, split, out_dir):
    d = dev[split]
    g = min(args.eval_videos, int(ids.shape[0]))
    text = d["text"][:g]
    # speed 1.0 -> the 10 sampled positions span stored frames 0..23, so
    # both action windows (ending by frame 22) complete inside the clip
    # and the final frame shows every object at its settled end state
    speed = jnp.full((g,), 1.0, jnp.float32)
    pos = jax.vmap(lambda s: clip_positions(s, args.frames_length))(speed)
    fs_vars = pipeline.first_stage.variables

    @jax.jit
    def run(params):
        lat0 = ids[:g, :1]
        gen = pipeline.core.apply(
            {"params": params}, lat0, text, speed, method="generate_cached",
            rngs={"latent": jax.random.PRNGKey(7)},
        )
        # max_chunk 128: the f32 VQ decoder at 128px runs ~16 MB of
        # activations per frame — 432 unchunked frames OOM'd the chip
        video = pipeline.first_stage.decode(gen, variables=fs_vars,
                                            max_chunk=128)
        idxg = jnp.arange(g)
        # flat single-level composition: vmapping frames_at over the clip
        # index nests a second vmap around compose_frames_cater's internal
        # one, which XLA miscompiles (wrong sprites / alpha-box artifacts,
        # ~19 dB gt corruption; see tests/test_device_data.py nested-vmap
        # regression). The flat form matches the (proven bit-exact)
        # stage-1 / materialize_latents call shape.
        gt = frames_at(
            dev, split, jnp.repeat(idxg, pos.shape[1]), pos.reshape(-1)
        ).reshape(g, pos.shape[1], 128, 128, 3)
        recon_gt = pipeline.first_stage.decode(
            ids[:g][idxg[:, None], pos], variables=fs_vars, max_chunk=128
        )
        mse_gen = jnp.mean((video - gt[:, 1:]) ** 2)
        mse_recon = jnp.mean((recon_gt[:, 1:] - gt[:, 1:]) ** 2)
        return video, gt, recon_gt, mse_gen, mse_recon

    video, gt, recon_gt, mse_gen, mse_recon = run(params)
    mse_gen = float(jax.device_get(mse_gen))
    mse_recon = float(jax.device_get(mse_recon))

    gen_np = np.asarray(jax.device_get(video), np.float64)
    gt_np = np.asarray(jax.device_get(gt), np.float64)
    metas = compact[split]["meta"][:g]
    bank_index = compact["bank_index"]
    bank_arr = compact["bank"]
    pm = precision_metrics(gen_np, metas, bank_index, bank_arr)
    pm_gt = precision_metrics(gt_np[:, 1:], metas, bank_index, bank_arr)
    log_metrics(out_dir, {
        "phase": f"generation_{split}", "samples": g,
        "gen_psnr_vs_gt": mse_to_psnr(mse_gen),
        "recon_psnr_vs_gt_upper_bound": mse_to_psnr(mse_recon),
        **pm,
        "gt_action_precision_ceiling": pm_gt["action_precision"],
        "gt_referring_precision_ceiling": pm_gt["referring_precision"],
    })
    dataset = "CATER-GEN-v1" if args.dataset == "caterv1" else "CATER-GEN-v2"
    recon_np = np.asarray(jax.device_get(recon_gt), np.float64)[:, 1:]
    e2e.log_fvd(out_dir, split, dataset, gt_np[:, 1:], gen_np, recon_np,
                batch_size=4)
    e2e.write_side_gifs(out_dir, split, gt_np, gen_np, args.gifs)
    return mse_gen


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}")

    if args.config is None:
        args.config = f"config/mage_{args.dataset}.yaml"
    dataset = "CATER-GEN-v1" if args.dataset == "caterv1" else "CATER-GEN-v2"
    # context lengths match the configs' static caption padding
    # (mage_caterv1.yaml:26 / mage_caterv2.yaml context_length)
    ctx = 32 if args.dataset == "caterv1" else 38
    compact = cs.build_compact_cater(args.num_train, args.num_val, args.seed,
                                     dataset=dataset, context_length=ctx)
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
    print(f"resident dataset: {compact['bank'].nbytes/1e6:.1f} MB bank "
          f"({compact['bank'].shape[0]} sprites), "
          f"{args.num_train} train / {args.num_val} val scenes")

    model = VectorQuantizedVAE(input_dim=3, down_ratio=8, dim=args.dim,
                               K=args.codebook)
    if args.skip_stage1 or args.eval_only:
        tx = vt.make_tx(args.lr1)
        state = vt.create_state(model, jax.random.PRNGKey(args.seed),
                                jnp.zeros((1, 128, 128, 3)), tx)
        state = Checkpointer(os.path.join(args.out, "vqvae")).restore(
            "best", state)
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
    log_metrics(args.out, {"phase": "latents",
                           "train_shape": list(ids_train.shape),
                           "sec": time.time() - t0})

    pipeline = build_pipeline(args, fs_variables)
    if args.eval_only:
        params = init_stage2_params(args, pipeline, ids_train.shape[2:])
        restored = Checkpointer(os.path.join(args.out, "mage")).restore(
            "best", {"step": jnp.zeros((), jnp.int32),
                     "params": jax.device_get(params)})
        params = jax.device_put(restored["params"])
    else:
        params = stage2(args, pipeline, dev, ids_train, ids_val, args.out)
    eval_generation(args, pipeline, params, dev, compact, ids_val, "val",
                    args.out)


if __name__ == "__main__":
    main()
