"""Localize the discrete CATER chain's semantic gap: teacher-forced deficit
vs autoregressive drift.

Run on CPU against the saved flagship checkpoints
(``env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/diag_ar_drift.py``):

  (a) teacher-forced per-token argmax accuracy on val clips, split into
      STATIC tokens (id == previous frame's id) vs MOVING tokens — if
      moving-token accuracy is low here, the model never learned the
      dynamics and more data/epochs is the lever (cater9k);
  (b) AR rollout (generate_cached from frame 0) token accuracy per frame
      position — if (a) is high but the rollout decays with position, the
      gap is exposure bias (train/test mismatch of the token stream), and
      data alone won't fix it.

Decides what round-5 spends chip time on.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # post-import override works

import jax.numpy as jnp
import numpy as np

import train_cater_e2e as ce
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training import vqvae_trainer as vt
from mage_tpu.training.checkpoint import Checkpointer

G = 6
OUT = "runs/cater_e2e"

args = ce.parse_args(["--out", OUT, "--eval-only"])
args.config = "config/mage_caterv2.yaml"  # main() derives this from --dataset
dataset = "CATER-GEN-v2"
compact = cs.build_compact_cater(args.num_train, args.num_val, args.seed,
                                 dataset=dataset, context_length=38)
norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0  # noqa: E731
dev = {
    "bank": jnp.concatenate(
        [norm(compact["bank"][..., :3]),
         jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1),
    "background": norm(compact["background"]),
    "val": {k: jnp.asarray(v) for k, v in compact["val"].items()
            if k != "meta"},
}

model = VectorQuantizedVAE(input_dim=3, down_ratio=8, dim=args.dim,
                           K=args.codebook)
state = vt.create_state(model, jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)), vt.make_tx(args.lr1))
state = Checkpointer(f"{OUT}/vqvae").restore("best", state)
fs_vars = {"params": state.params, "batch_stats": state.batch_stats}

# encode just the G diagnostic clips at the eval's speed-1.0 positions
pos = np.asarray(ce.clip_positions(jnp.float32(1.0), args.frames_length))
L = args.frames_length


@jax.jit
def encode_clips():
    idx = jnp.repeat(jnp.arange(G), L)
    t = jnp.tile(jnp.asarray(pos), G)
    frames = ce.frames_at(dev, "val", idx, t)
    ids = model.apply(fs_vars, frames, method="encode", mutable=False)
    return ids.reshape(G, L, *ids.shape[1:]).astype(jnp.int32)


ids = encode_clips()  # (G, L, 16, 16) GT token stream at eval positions
print("encoded", ids.shape)

pipeline = ce.build_pipeline(args, fs_vars)
params = ce.init_stage2_params(args, pipeline, ids.shape[2:])
restored = Checkpointer(f"{OUT}/mage").restore(
    "best", {"step": jnp.zeros((), jnp.int32),
             "params": jax.device_get(params)})
params = restored["params"]

text = dev["val"]["text"][:G]
speed = jnp.full((G,), 1.0, jnp.float32)


@jax.jit
def teacher_forced(params):
    out = pipeline.core.apply(
        {"params": params}, ids, text, speed, train=False,
        rngs={"latent": jax.random.PRNGKey(0)})
    return jnp.argmax(out["predict"], axis=-1).astype(jnp.int32)


@jax.jit
def rollout(params):
    return pipeline.core.apply(
        {"params": params}, ids[:, :1], text, speed,
        method="generate_cached", rngs={"latent": jax.random.PRNGKey(7)})


tf_ids = np.asarray(teacher_forced(params))        # (G, L-1, 16, 16)
gen_ids = np.asarray(rollout(params))              # (G, L-1, 16, 16)
gt = np.asarray(ids)
labels = gt[:, 1:]
prev = gt[:, :-1]
moving = labels != prev

def acc(pred, mask=None):
    ok = pred == labels
    if mask is not None:
        return float(ok[mask].mean()) if mask.any() else float("nan")
    return float(ok.mean())

print(f"tokens: {labels.size}, moving fraction {moving.mean():.4f}")
print(f"teacher-forced acc: all {acc(tf_ids):.4f}  "
      f"moving {acc(tf_ids, moving):.4f}  static {acc(tf_ids, ~moving):.4f}")
print(f"AR rollout    acc: all {acc(gen_ids):.4f}  "
      f"moving {acc(gen_ids, moving):.4f}  static {acc(gen_ids, ~moving):.4f}")
print("per-frame acc (position 1..L-1):")
for j in range(labels.shape[1]):
    m = moving[:, j]
    print(f"  t={j+1}: tf all {float((tf_ids[:, j] == labels[:, j]).mean()):.4f} "
          f"moving {float((tf_ids[:, j] == labels[:, j])[m].mean()):.4f} | "
          f"gen all {float((gen_ids[:, j] == labels[:, j]).mean()):.4f} "
          f"moving {float((gen_ids[:, j] == labels[:, j])[m].mean()):.4f}")
# agreement between rollout and teacher-forced predictions (how much of
# the rollout's error is its own compounding vs shared model error)
agree = float((gen_ids == tf_ids).mean())
print(f"gen-vs-tf agreement: {agree:.4f}")
