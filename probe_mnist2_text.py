"""CPU probe: is the trained mnist2 stage-2 model sensitive to the caption?

Teacher-forced CE on GT latents under (a) the true caption, (b) the
direction-swapped caption (up<->down, left<->right tokens), (c) a
shuffled caption from another clip. If (b)/(c) don't raise CE, the model
ignores text and more epochs won't fix direction binding.

Measured on the 30-epoch runs/mnist2_e2e checkpoint (2026-08-17): mean CE
0.01046 under ALL THREE caption variants (identical to 5 significant
digits; per-frame deltas only at ~1e-4 relative), and 0.00% of argmax
token ids change under either swap or shuffle. Per-frame CE collapses
from 0.059 (frame 1) to ~1e-8 after frame 7 — the stop-at-wall data is
mostly-static, so nearly all learning signal sits in the first few frames
and the direction-dependent part of that is cheap enough to hedge. The
model converged to a caption-ignoring equilibrium (the pathway is alive:
shuffle moves CE at the 4th decimal), motivating the re-warmed +30-epoch
continuation instead of finishing the decayed cosine tail. Contrast: the
single-MNIST model (same architecture/pipeline) demonstrably binds
captions — its 28.3 dB generation-vs-GT PSNR is impossible without
following the caption's direction.

Run on CPU (the checkpoint restore + three B=16 forwards take ~5 min):
    PYTHONPATH=/root/repo:/root/.axon_site PALLAS_AXON_POOL_IPS= \
      JAX_PLATFORMS=cpu python probe_mnist2_text.py
"""
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

from train_mnist2_e2e import build_pipeline, parse_args, frames_at

B = 16
L = 16

args = parse_args(["--num-train", "64", "--num-val", str(B)])
compact = dd.build_compact_double_modified(64, B, args.seed)
dev = {
    "bank": dd.normalize_bank(compact["bank"]),
    "train": {k: jnp.asarray(v) for k, v in compact["train"].items()},
    "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
}

model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=256, K=512)
tx = vt.make_tx(1e-4)
state = vt.create_state(model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)), tx)
state = Checkpointer("runs/mnist2_e2e/vqvae").restore("best", state)
print("vqvae restored")

d = dev["val"]
speed = jnp.full((B,), 0.5, jnp.float32)
pos = jax.vmap(lambda s, ln: dd.clip_indices_var(s, ln, L))(speed, d["length"][:B])

# encode the L subsampled frames of each clip
variables = {"params": state.params, "batch_stats": state.batch_stats}
flat_idx = jnp.repeat(jnp.arange(B), L)
flat_t = pos.reshape(-1)
frames = frames_at(dev, "val", flat_idx, flat_t)
ids = model.apply(variables, frames, method="encode", mutable=False)
ids = ids.reshape(B, L, *ids.shape[1:]).astype(jnp.int32)
print("ids", ids.shape)

fs_variables = variables
pipeline = build_pipeline(args, fs_variables)
ctx = pipeline.core.text_context_length
tmpl = pipeline.core.init(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
     "latent": jax.random.PRNGKey(0)},
    jnp.zeros((1, L, 16, 16), jnp.int32), jnp.zeros((1, ctx), jnp.int32),
    jnp.zeros((1,), jnp.float32), train=True)["params"]
restored = Checkpointer("runs/mnist2_e2e/mage").restore(
    "final", {"step": jnp.zeros((), jnp.int32), "params": jax.device_get(tmpl)})
params = restored["params"]
print("mage restored, step", restored["step"])

text_true = np.asarray(d["text"][:B])
# direction swap: up(24)<->down(25), left(26)<->right(27)
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
# early frames matter most for direction
print(f"frames 1-4 delta swapped-true: "
      f"{ce_s[:4].mean()-ce_t[:4].mean():+.5f} "
      f"({100*(ce_s[:4].mean()/ce_t[:4].mean()-1):+.1f}%)")
