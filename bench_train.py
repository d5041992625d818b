#!/usr/bin/env python
"""Flagship stage-2 training-step benchmark (seconds/step on one chip).

Times the fused jitted train step (first-stage encode + teacher-forced
forward + backward + Adam) of the CATER-scale MAGE (d=512, 6 axial layers,
randomness branch on) — the configuration whose FLOPs are dominated by the
stochastic branch's 3x3x3x512ch video convs (see BENCH_NOTES.md).

Prints ONE JSON line. Knobs (env):
    TRAIN_BATCH   global batch (default 16, the reference recipe)
    TRAIN_FRAMES  frames_length (default 16 to match the generation bench;
                  the shipped configs use 10)
    TRAIN_DTYPE   bfloat16 (default; mixed precision, f32 master params) or
                  float32
    TRAIN_REMAT   1 -> rematerialize axial blocks + conv3d pyramid
    TRAIN_STEPS   timed steps (default 3)

Inputs are created ON DEVICE (the tunneled backend moves ~0.5 MB/s H2D);
timing uses the scalar-checksum fetch discipline from bench.py.
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mage_tpu.config import load_config
    from mage_tpu.models.pipeline import MagePipeline
    from mage_tpu.training.mage_trainer import (
        MageTrainState,
        make_mage_train_step,
        make_mage_tx,
    )

    batch = int(os.environ.get("TRAIN_BATCH", "16"))
    frames = int(os.environ.get("TRAIN_FRAMES", "16"))
    dtype_name = os.environ.get("TRAIN_DTYPE", "bfloat16")
    compute_dtype = None if dtype_name == "float32" else jnp.dtype(dtype_name)
    remat = os.environ.get("TRAIN_REMAT", "0") == "1"
    n_steps = int(os.environ.get("TRAIN_STEPS", "3"))

    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "config/mage_caterv1.yaml")
    )
    p = cfg.model.params
    p.first_stage_config.params.pop("ckpt_path", None)
    p.frames_length = frames
    p.generate_decoder_config.params.frames_length = frames
    p.remat = remat
    pipeline = MagePipeline(**p.to_dict())

    tx = make_mage_tx()
    train_step = make_mage_train_step(pipeline, tx, compute_dtype)

    ctx = pipeline.core.text_context_length

    @jax.jit
    def make_batch(rng):
        k1, k2, k3 = jax.random.split(rng, 3)
        images = jax.random.uniform(
            k1, (batch, frames, 128, 128, 3), jnp.float32, -0.5, 0.5
        )
        text = jnp.zeros((batch, ctx), jnp.int32)
        text = text.at[:, 0].set(1)
        text = text.at[:, 1:5].set(jax.random.randint(k2, (batch, 4), 3, 29))
        text = text.at[:, 5].set(2)
        speed = jax.random.uniform(k3, (batch,))
        return {"images": images, "text": text, "speed": speed}

    dev_batch = make_batch(jax.random.PRNGKey(0))
    host_probe = {
        "images": jnp.zeros((1, frames, 128, 128, 3), jnp.float32),
        "text": jnp.zeros((1, ctx), jnp.int32),
        "speed": jnp.zeros((1,), jnp.float32),
    }
    params = pipeline.init(jax.random.PRNGKey(0), host_probe)
    fs_vars = pipeline.first_stage.variables
    state = MageTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=jax.jit(tx.init)(params),
    )

    # tunnel RTT for the checksum-fetch timing discipline (see bench.py)
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(5):
        float(trivial(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / 5

    # warmup/compile step (fetch the loss; the step is one XLA program, so
    # any output implies the whole program ran)
    state, terms = train_step(
        state, fs_vars, dev_batch, 5e-5, 0.00025, 0.001, jax.random.PRNGKey(1)
    )
    loss0 = float(terms["final_loss"])
    assert jnp.isfinite(loss0), loss0

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, terms = train_step(
            state, fs_vars, dev_batch, 5e-5, 0.00025, 0.001,
            jax.random.PRNGKey(2 + i),
        )
        float(terms["final_loss"])
    dt = max((time.perf_counter() - t0) / n_steps - rtt, 1e-9)

    print(
        json.dumps(
            {
                "metric": "flagship_train_sec_per_step",
                "value": round(dt, 3),
                "unit": "s/step",
                "config": {
                    "batch": batch,
                    "frames": frames,
                    "dtype": dtype_name,
                    "remat": remat,
                    "loss_after_warmup": round(loss0, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
