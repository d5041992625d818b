"""Diagnose the 20 dB gap between stage-1 val recon (39.5 dB) and the
generation eval's recon_psnr_vs_gt_upper_bound (19.0 dB) on the flagship
CATER chain. CPU-only; reads runs/cater_e2e/vqvae/best.

Measures, on the SAME val clips/positions the eval uses:
  (a) stage-1-style recon: encode+decode frame 0 and frame 12 of val clips
  (b) eval-style recon: encode all stored frames -> ids, decode ids at
      speed-1.0 sampled positions, compare to composed GT frames
If (a) ~ 39 dB and (b) ~ 19 dB with the same checkpoint, the gap is in the
position sampling / indexing; if both are ~19 dB, stage-1's own val metric
is the odd one out.

NOTE on the env overrides below: they are TOO LATE to force CPU —
sitecustomize imports jax at interpreter start, so this script actually
runs on the axon TPU backend unless launched as
``env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/...``.
That accident is what localized the round-4 GT corruption to the TPU
backend: the per-clip loop below came out clean ON CHIP while the evals'
nested-vmap form was corrupted (see tests/test_device_data.py and
scripts/kernel_smoke.py case nested_vmap_compose).
"""
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"  # too late under sitecustomize; see above
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import mage_tpu.data.generators.cater_synthetic as cs
import mage_tpu.data.device_data as dd
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training import vqvae_trainer as vt
from mage_tpu.training.checkpoint import Checkpointer

T_STORE = 24
G = 8

compact = cs.build_compact_cater(8, G, 0, dataset="CATER-GEN-v2",
                                 context_length=38)
norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0
dev = {
    "bank": jnp.concatenate(
        [norm(compact["bank"][..., :3]),
         jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1),
    "background": norm(compact["background"]),
    "val": {k: jnp.asarray(v) for k, v in compact["val"].items()
            if k != "meta"},
}


def frames_at(idx, t):
    d = dev["val"]
    return dd.compose_frames_cater(
        dev["bank"], dev["background"],
        d["sid"][idx, t], d["top"][idx, t], d["left"][idx, t])


model = VectorQuantizedVAE(input_dim=3, down_ratio=8, dim=256, K=512)
tx = vt.make_tx(1e-4)
state = vt.create_state(model, jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)), tx)
state = Checkpointer("runs/cater_e2e/vqvae").restore("best", state)
variables = {"params": state.params, "batch_stats": state.batch_stats}


def psnr(mse):
    return 10.0 * np.log10(4.0 / max(float(mse), 1e-12))


# (a) stage-1-style
for f in (0, 12, 23):
    fr = frames_at(jnp.arange(G), jnp.full((G,), f))
    ids = model.apply(variables, fr, method="encode", mutable=False)
    rec = model.apply(variables, ids, method="decode", mutable=False)
    mse = float(jnp.mean((rec - fr) ** 2))
    print(f"(a) frame {f:2d}: mse {mse:.6f} psnr {psnr(mse):.2f} dB")

# (b) eval-style: ids over all stored frames, sample positions at speed 1.0
ids_all = []
for i in range(G):
    fr = frames_at(jnp.full((T_STORE,), i), jnp.arange(T_STORE))
    ids_all.append(model.apply(variables, fr, method="encode", mutable=False))
ids_all = jnp.stack(ids_all)  # (G, 24, 16, 16)

speed = jnp.full((G,), 1.0, jnp.float32)
q = T_STORE / (1.0 + 1.4 * speed)
count = jnp.maximum(jnp.round(q).astype(jnp.int32), 10)
i = jnp.arange(10, dtype=jnp.int32)
pos = (i[None, :] * (T_STORE - 1)) // jnp.maximum(count[:, None] - 1, 1)
print("positions:", np.asarray(pos[0]))

gt = jnp.stack([frames_at(jnp.full((10,), k), pos[k]) for k in range(G)])
sel = ids_all[jnp.arange(G)[:, None], pos]  # (G, 10, 16, 16)
rec = model.apply(variables, sel.reshape(-1, 16, 16),
                  method="decode", mutable=False)
rec = rec.reshape(G, 10, 128, 128, 3)
mse_all = float(jnp.mean((rec[:, 1:] - gt[:, 1:]) ** 2))
print(f"(b) eval-style recon: mse {mse_all:.6f} psnr {psnr(mse_all):.2f} dB")
per_frame = jnp.mean((rec - gt) ** 2, axis=(0, 2, 3, 4))
for k in range(10):
    print(f"    pos {int(pos[0][k]):2d}: mse {float(per_frame[k]):.6f} "
          f"psnr {psnr(per_frame[k]):.2f} dB")
