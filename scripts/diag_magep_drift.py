"""Follow-up to diag_magep_semantic: per-position motion decay in the
MAGE+ rollout vs teacher-forced.

The rollout's slot 1 conditions on exactly the same inputs as the
teacher-forced position 1 (GT frame 0 + anchor), so if generation motion
dies only at later positions the mechanism is compounding feedback
(exposure bias): the MSE-blurred prediction fed back in is conservative,
the next step conditions on a near-static context and regresses further.

Run: env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
       python scripts/diag_magep_drift.py
"""
import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import train_cater_e2e as ce
import train_cater_kl_e2e as ke
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.models.autoencoder_kl import DiagonalGaussian
from mage_tpu.training.checkpoint import Checkpointer

G = 16
OUT = "runs/cater_kl_9k"

args = ke.parse_args([
    "--out", OUT, "--skip-ae", "--v-kl", "25",
    "--num-train", "9000", "--num-val", "600",
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
ae_params = Checkpointer(f"{OUT}/klae").restore(
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


mom = encode_clips()
pipeline = ke.build_pipeline(args, model, ae_params)
params = Checkpointer(f"{OUT}/mage").restore(
    "final", {"step": jnp.zeros((), jnp.int32),
              "params": jax.device_get(ke.init_stage2_params(args,
                                                             pipeline))}
)["params"]
text = dev["val"]["text"][:G]
speed = jnp.full((G,), 1.0, jnp.float32)
lat = ke.sample_latents(mom, jax.random.PRNGKey(3),
                        args.posterior_logvar_shift).astype(jnp.float32)
lat_mean = DiagonalGaussian(mom.astype(jnp.float32)).mode()


@functools.partial(jax.jit, static_argnums=(1,))
def teacher_forced(params, test_flag):
    return pipeline.core.apply(
        {"params": params}, lat, text, speed, train=False,
        test_flag=test_flag,
        rngs={"latent": jax.random.PRNGKey(7)})["predict"].astype(jnp.float32)


@jax.jit
def rollout(params):
    return pipeline.core.apply(
        {"params": params}, lat[:, :1], text, speed,
        method="generate_cached",
        rngs={"latent": jax.random.PRNGKey(7)}).astype(jnp.float32)


tf_pred = np.asarray(teacher_forced(params, True))  # prior sample = gen path
gen = np.asarray(rollout(params))
target = np.asarray(lat_mean[:, 1:])
prevm = np.asarray(lat_mean[:, :-1])
d2 = ((target - prevm) ** 2).mean(-1)
moving = d2 > np.quantile(d2, 0.90)

print("slot-1 agreement: tf[:,0] vs gen[:,0] mse "
      f"{float(((tf_pred[:, 0] - gen[:, 0]) ** 2).mean()):.6f} "
      f"(signal msq {float((tf_pred[:, 0] ** 2).mean()):.4f})")

rows = []
for j in range(target.shape[1]):
    m = moving[:, j]
    row = {
        "pos": j + 1,
        "tf_mse_moving": float((((tf_pred[:, j] - target[:, j]) ** 2
                                 ).mean(-1))[m].mean()) if m.any() else None,
        "gen_mse_moving": float((((gen[:, j] - target[:, j]) ** 2
                                  ).mean(-1))[m].mean()) if m.any() else None,
        "gt_step_energy": float(d2[:, j][m].mean()) if m.any() else None,
    }
    if j > 0:
        mm = moving[:, j]
        row["tf_motion"] = float((((tf_pred[:, j] - tf_pred[:, j - 1]) ** 2
                                   ).mean(-1))[mm].mean())
        row["gen_motion"] = float((((gen[:, j] - gen[:, j - 1]) ** 2
                                    ).mean(-1))[mm].mean())
    rows.append(row)
    print(row)

with open("docs/results/diag_magep_drift.json", "w") as f:
    json.dump(rows, f, indent=2)
