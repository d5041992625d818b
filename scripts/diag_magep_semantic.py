"""Localize the MAGE+ CATER semantic gap: posterior leak vs MSE blurring.

Context (runs/cater_kl_9k, v_kl=25, 9k scenes): action precision 0.3125
with a striking per-action split — rotate 0.91 but slide / pick-place /
contain all 0.0. Translations never happen in generations. Two candidate
mechanisms, distinguishable on CPU with the saved checkpoint:

  (A) POSTERIOR LEAK: the video posterior (KL ~24 nats = ~34 bits — enough
      for the discrete action choices) carries the motion trajectory at
      train time, so the decoder never learns to read motion from text;
      at test time the prior sample carries nothing -> static scenes.
      Signature: teacher-forced moving-token MSE with the POSTERIOR sample
      is much lower than with a PRIOR sample.
  (B) MSE BLURRING (continuous-regression multimodality): under ambiguous
      quadrant captions the endpoint is underdetermined, and MSE training
      regresses to the mean of possible positions -> smeared/static
      predictions even teacher-forced. Signature: posterior ~= prior
      teacher-forced moving MSE, and prediction motion energy << GT motion
      energy on moving tokens in BOTH settings.

Reference behavior being diagnosed: the randomness branch + test-time
prior sampling of /root/reference/modules/mage_model.py:600-609,660-664.

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
       python scripts/diag_magep_semantic.py [--out runs/cater_kl_9k]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # post-import override works

import jax.numpy as jnp
import numpy as np

import train_cater_e2e as ce
import train_cater_kl_e2e as ke
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.models.autoencoder_kl import DiagonalGaussian
from mage_tpu.training.checkpoint import Checkpointer

G = 16


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="runs/cater_kl_9k")
    p.add_argument("--num-train", type=int, default=9000)
    p.add_argument("--num-val", type=int, default=600)
    p.add_argument("--v-kl", type=float, default=25.0)
    return p.parse_args()


dargs = parse()
args = ke.parse_args([
    "--out", dargs.out, "--skip-ae", "--v-kl", str(dargs.v_kl),
    "--num-train", str(dargs.num_train), "--num-val", str(dargs.num_val),
])

compact = cs.build_compact_cater(args.num_train, args.num_val, args.seed,
                                 mode="ambiguous", dataset="CATER-GEN-v2",
                                 context_length=38)
norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0  # noqa: E731
dev = {
    "bank": jnp.concatenate(
        [norm(compact["bank"][..., :3]),
         jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1),
    "background": norm(compact["background"]),
    "val": {k: jnp.asarray(v) for k, v in compact["val"].items()
            if k != "meta"},
}

model = ke.make_ae(args)
tmpl = jax.jit(lambda: model.init(
    {"params": jax.random.PRNGKey(0)},
    jnp.zeros((1, 128, 128, 3)), jax.random.PRNGKey(0))["params"])()
ae_params = Checkpointer(f"{args.out}/klae").restore(
    "best", {"params": jax.device_get(tmpl)})["params"]

L = args.frames_length
pos = np.asarray(ce.clip_positions(jnp.float32(1.0), L))


@jax.jit
def encode_clips():
    idx = jnp.repeat(jnp.arange(G), L)
    t = jnp.tile(jnp.asarray(pos), G)
    frames = ce.frames_at(dev, "val", idx, t)
    mom = model.apply({"params": ae_params}, frames,
                      method="encode_moments")
    return mom.reshape(G, L, *mom.shape[1:])


mom = encode_clips()  # (G, L, 16, 16, 8) posterior moments
print("encoded moments", mom.shape)

pipeline = ke.build_pipeline(args, model, ae_params)
params = Checkpointer(f"{args.out}/mage").restore(
    "final", {"step": jnp.zeros((), jnp.int32),
              "params": jax.device_get(ke.init_stage2_params(args,
                                                             pipeline))}
)["params"]

text = dev["val"]["text"][:G]
speed = jnp.full((G,), 1.0, jnp.float32)
# training feeds SAMPLED latents (the reference's stochastic
# get_first_stage_encoding); use one fixed sample for the inputs and the
# posterior-moments MEAN for the motion mask (no sampling noise in it)
lat_sample = ke.sample_latents(mom, jax.random.PRNGKey(3),
                               args.posterior_logvar_shift).astype(jnp.float32)
lat_mean = DiagonalGaussian(mom.astype(jnp.float32)).mode()


import functools


@functools.partial(jax.jit, static_argnums=(1,))
def teacher_forced(params, test_flag):
    out = pipeline.core.apply(
        {"params": params}, lat_sample, text, speed, train=False,
        test_flag=test_flag, rngs={"latent": jax.random.PRNGKey(11)})
    return out["predict"].astype(jnp.float32), out["kl_loss"]


@jax.jit
def rollout(params):
    return pipeline.core.apply(
        {"params": params}, lat_sample[:, :1], text, speed,
        method="generate_cached",
        rngs={"latent": jax.random.PRNGKey(7)}).astype(jnp.float32)


pred_post, kl = teacher_forced(params, False)   # posterior sample (train path)
pred_prior, _ = teacher_forced(params, True)    # prior sample (test path)
gen = rollout(params)                            # (G, L-1, 16, 16, 4)

target = np.asarray(lat_sample[:, 1:])
prev = np.asarray(lat_sample[:, :-1])
tmean = np.asarray(lat_mean[:, 1:])
pmean = np.asarray(lat_mean[:, :-1])
# motion mask from the clean (mean) latents: top-quantile temporal energy
d2 = ((tmean - pmean) ** 2).mean(-1)            # (G, L-1, 16, 16)
thresh = np.quantile(d2, 0.90)
moving = d2 > thresh
print(f"moving mask: {moving.mean():.4f} of tokens, d2 thresh {thresh:.5f}")

report = {"phase": "diag_magep_semantic", "out": dargs.out,
          "kl_nats": float(kl), "moving_frac": float(moving.mean()),
          "samples": G}


def mse(pred, mask=None):
    e = ((np.asarray(pred) - target) ** 2).mean(-1)
    return float(e[mask].mean()) if mask is not None else float(e.mean())


for name, pred in (("posterior", pred_post), ("prior", pred_prior)):
    report[f"tf_{name}_mse_all"] = mse(pred)
    report[f"tf_{name}_mse_moving"] = mse(pred, moving)
    report[f"tf_{name}_mse_static"] = mse(pred, ~moving)

# does the prediction MOVE where GT moves? temporal diff energy of the
# prediction stream vs GT's, restricted to moving tokens (t>=1 diffs)
def motion_energy(x):  # x: (G, L-1, 16, 16, 4)
    x = np.asarray(x)
    d = ((x[:, 1:] - x[:, :-1]) ** 2).mean(-1)
    return float(d[moving[:, 1:]].mean())


report["gt_moving_energy"] = motion_energy(tmean)
report["tf_posterior_moving_energy"] = motion_energy(pred_post)
report["tf_prior_moving_energy"] = motion_energy(pred_prior)
report["gen_moving_energy"] = motion_energy(gen)

# prior-vs-posterior prediction divergence on moving tokens: how much the
# sample actually changes the prediction (leak bandwidth in latent space)
dp = ((np.asarray(pred_post) - np.asarray(pred_prior)) ** 2).mean(-1)
report["pred_post_vs_prior_mse_moving"] = float(dp[moving].mean())
report["pred_post_vs_prior_mse_static"] = float(dp[~moving].mean())

print(json.dumps(report, indent=2))
# one file per diagnosed run so successive diags never clobber each
# other's record (the r5 diag_ss run overwrote the r4 baseline before
# this fix; the baseline was restored from git)
tag = os.path.basename(os.path.normpath(args.out))
with open(f"docs/results/diag_magep_semantic_{tag}.json", "w") as f:
    json.dump(report, f, indent=2)
