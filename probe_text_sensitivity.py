"""CPU probe: is a trained stage-2 model sensitive to its caption?

Teacher-forced CE on GT latents under (a) the true caption, (b) the
direction-swapped caption (up<->down, left<->right, token ids 24-27 in
MNIST_VOCAB), (c) a shuffled caption from another clip. If (b)/(c) don't
raise CE, the model ignores text and more epochs of the same schedule
won't fix direction binding.

Measured (2026-08-18):

- ``--dataset double`` on the 30-epoch runs/mnist2_e2e checkpoint: mean CE
  0.01046 under ALL THREE caption variants (identical to 5 significant
  digits; per-frame deltas ~1e-4 relative), 0.00% of argmax ids change.
  Per-frame CE collapses 0.059 (frame 1) -> ~1e-8 after frame 7: the
  stop-at-wall data is mostly static, so nearly all learning signal sits
  in the first few frames and the direction-dependent part is cheap to
  hedge. The model converged to a caption-ignoring equilibrium (the
  pathway is alive — shuffle moves CE at the 4th decimal), motivating a
  re-warmed continuation over finishing the decayed cosine tail.
- ``--dataset single`` on runs/mnist_e2e_full (201 epochs): **shuffled
  captions raise CE +120.8%** (frame-1 CE 0.062 -> 0.389: the caption's
  digit word now conflicts with the visible frame-0 digit), proving the
  text pathway trains to real sensitivity on the same architecture.
  Direction-word swaps however move CE only +0.1% — teacher-forced CE
  cannot resolve direction binding because a hedged marginal over the
  two trajectory continuations is cheap (few moving latent tokens);
  probe_direction_binding.py tests direction GENERATIVELY instead.

Run on CPU (checkpoint restore + three B=16 forwards, ~5 min):
    PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_POOL_IPS= \
      JAX_PLATFORMS=cpu python probe_text_sensitivity.py --dataset single
"""
import argparse
import os

if os.environ.get("JAX_PLATFORMS") is None:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

import mage_tpu.data.device_data as dd
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training.checkpoint import Checkpointer
import mage_tpu.training.vqvae_trainer as vt


def gt_latents_single(args, model, variables, dev, B, L):
    """Encode speed-0.5 subsampled val clips -> (B, L, h, w) ids."""
    d = dev["val"]
    speed = jnp.full((B,), 0.5, jnp.float32)
    pos = jax.vmap(lambda s: dd.clip_indices(s, frames_length=L))(speed)

    @jax.jit
    def enc(variables, digit, ys, xs):
        # flat single-level composition (nested vmap around compose_frames'
        # internal one miscompiles under jit; see tests/test_device_data.py
        # nested-vmap regression)
        rows = jnp.repeat(jnp.arange(B), L)
        cols = pos.reshape(-1)
        frames = dd.compose_frames(dev["bank"], jnp.repeat(digit[:B], L),
                                   ys[rows, cols], xs[rows, cols])
        ids = model.apply(variables, frames, method="encode", mutable=False)
        return ids.reshape(B, L, *ids.shape[1:]).astype(jnp.int32)

    return enc(variables, d["digit"][:B], d["ys"][:B], d["xs"][:B]), speed


def gt_latents_double(args, model, variables, dev, B, L):
    from train_mnist2_e2e import frames_at

    d = dev["val"]
    speed = jnp.full((B,), 0.5, jnp.float32)
    pos = jax.vmap(lambda s, ln: dd.clip_indices_var(s, ln, L))(
        speed, d["length"][:B]
    )

    @jax.jit
    def enc(variables):
        flat_idx = jnp.repeat(jnp.arange(B), L)
        frames = frames_at(dev, "val", flat_idx, pos.reshape(-1))
        ids = model.apply(variables, frames, method="encode", mutable=False)
        return ids.reshape(B, L, *ids.shape[1:]).astype(jnp.int32)

    return enc(variables), speed


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=("single", "double"), default="double")
    ap.add_argument("--run", default=None)
    ap.add_argument("--ckpt", default="final")
    ap.add_argument("--videos", type=int, default=16)
    args = ap.parse_args(argv)
    B, L = args.videos, 16

    if args.dataset == "single":
        from train_mnist_e2e import build_pipeline, parse_args

        run = args.run or "runs/mnist_e2e_full"
        targs = parse_args(["--out", run])
        compact = dd.build_compact_single_mnist(
            targs.num_train, targs.num_val, targs.seed, targs.mnist_npz
        )
    else:
        from train_mnist2_e2e import build_pipeline, parse_args

        run = args.run or "runs/mnist2_e2e"
        targs = parse_args(["--out", run])
        compact = dd.build_compact_double_modified(
            targs.num_train, targs.num_val, targs.seed
        )

    dev = {
        "bank": dd.normalize_bank(compact["bank"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
    }
    d = dev["val"]

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4,
                               dim=targs.dim, K=targs.codebook)
    state = vt.create_state(model, jax.random.PRNGKey(targs.seed),
                            jnp.zeros((1, 64, 64, 1)), vt.make_tx(targs.lr1))
    state = Checkpointer(os.path.join(run, "vqvae")).restore("best", state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    print("vqvae restored")

    latents_fn = gt_latents_single if args.dataset == "single" else gt_latents_double
    ids, speed = latents_fn(args, model, variables, dev, B, L)
    print("ids", ids.shape)

    pipeline = build_pipeline(targs, variables)
    ctx = pipeline.core.text_context_length
    tmpl = jax.jit(
        lambda: pipeline.core.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
             "latent": jax.random.PRNGKey(0)},
            jnp.zeros((1, L, 16, 16), jnp.int32), jnp.zeros((1, ctx), jnp.int32),
            jnp.zeros((1,), jnp.float32), train=True)["params"]
    )()
    restored = Checkpointer(os.path.join(run, "mage")).restore(
        args.ckpt, {"step": jnp.zeros((), jnp.int32),
                    "params": jax.device_get(tmpl)})
    params = restored["params"]
    print("mage restored, step", int(jax.device_get(restored["step"])))

    text_true = np.asarray(d["text"][:B])
    # direction swap: up(24)<->down(25), left(26)<->right(27) (MNIST_VOCAB)
    swap = {24: 25, 25: 24, 26: 27, 27: 26}
    text_swap = text_true.copy()
    for a, b2 in swap.items():
        text_swap[text_true == a] = b2
    text_shuf = np.roll(text_true, 1, axis=0)
    changed = (text_swap != text_true).sum(axis=1)
    print("direction tokens swapped per caption:", changed)

    def per_frame_ce(params, ids, speed, text):
        out = pipeline.core.apply(
            {"params": params}, ids, text, speed,
            train=False, rngs={"dropout": jax.random.PRNGKey(0),
                               "latent": jax.random.PRNGKey(0)})
        logits = out["predict"].astype(jnp.float32)  # (B, L-1, h, w, K)
        tgt = ids[:, 1:]
        lse = jax.nn.logsumexp(logits, axis=-1)
        ll = jnp.take_along_axis(logits, tgt[..., None], axis=-1)[..., 0]
        ce = (lse - ll).mean(axis=(0, 2, 3))  # per predicted frame
        am = jnp.argmax(logits, axis=-1)
        return ce, am

    f = jax.jit(per_frame_ce)
    ce_t, am_t = map(np.asarray, f(params, ids, speed, jnp.asarray(text_true)))
    ce_s, am_s = map(np.asarray, f(params, ids, speed, jnp.asarray(text_swap)))
    ce_r, am_r = map(np.asarray, f(params, ids, speed, jnp.asarray(text_shuf)))
    print("\nper-frame CE (frames 1..15):")
    print("true   :", np.array2string(ce_t, precision=4))
    print("swapped:", np.array2string(ce_s, precision=4))
    print("shuffle:", np.array2string(ce_r, precision=4))
    print(f"\nmean CE: true {ce_t.mean():.5f} swapped {ce_s.mean():.5f} "
          f"shuffled {ce_r.mean():.5f}")
    print(f"delta swapped-true: {ce_s.mean()-ce_t.mean():+.5f} "
          f"({100*(ce_s.mean()/ce_t.mean()-1):+.1f}%)")
    print(f"delta shuffle-true: {ce_r.mean()-ce_t.mean():+.5f} "
          f"({100*(ce_r.mean()/ce_t.mean()-1):+.1f}%)")
    print(f"argmax ids changed by swap: {100*(am_s != am_t).mean():.2f}% "
          f"(shuffle: {100*(am_r != am_t).mean():.2f}%)")
    print(f"frames 1-4 delta swapped-true: "
          f"{ce_s[:4].mean()-ce_t[:4].mean():+.5f} "
          f"({100*(ce_s[:4].mean()/ce_t[:4].mean()-1):+.1f}%)")


if __name__ == "__main__":
    main()
