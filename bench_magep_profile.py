#!/usr/bin/env python
"""MAGE+ generation cost decomposition (the continuous/KL flagship).

BENCH_NOTES r2: MAGE+ totals 587 ms/call (batch 32, L=16, KL chunk 96) =
817 f/s vs the >= 1000 target. bench_kl_decode.py isolates the pixel
decoder (~416 ms); this probe times the remaining components on the same
jitted paths pipeline.generate uses:

  ar_core     generate_cached core only (no first-stage encode/decode)
  encode0     KL-AE encode of the 32 first frames + posterior sample
  full        pipeline.generate end-to-end (reference for the sum)

One JSON line each; checksum-fetch timing minus median RTT.
Env: BENCH_BATCH (32), BENCH_DTYPE (bfloat16), MAGE_KL_FRAME_CHUNK, MAGE_KL_UP.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_pipeline
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    frames_length = 16
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    pipeline = build_pipeline(frames_length, "mage+")
    core = pipeline.core
    rng = np.random.RandomState(0)
    ctx = core.text_context_length

    host_batch = {
        "images": (rng.rand(batch, frames_length, 128, 128, 3).astype(np.float32) - 0.5),
        "text": np.zeros((batch, ctx), np.int32),
        "speed": rng.rand(batch).astype(np.float32),
    }
    host_batch["text"][:, 0] = 1
    host_batch["text"][:, 1:5] = rng.randint(3, 29, size=(batch, 4))
    host_batch["text"][:, 5] = 2

    params = pipeline.init(jax.random.PRNGKey(0), host_batch)
    fs_vars = pipeline.first_stage.variables

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    params, fs_vars = cast(params), cast(fs_vars)
    dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
    dev_batch["images"] = dev_batch["images"].astype(dtype)
    dev_batch["speed"] = dev_batch["speed"].astype(dtype)
    latents0 = jnp.asarray(rng.randn(batch, 1, 16, 16, 4), dtype)

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    rtts = []
    for i in range(15):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(i)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def time_fn(fn, *args, n=5):
        c0 = float(fn(*args))
        assert np.isfinite(c0)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(max(time.perf_counter() - t0 - rtt, 0.0))
        return float(np.mean(ts)) * 1e3

    ar = jax.jit(lambda p, l0, t, s: jnp.sum(
        core.apply({"params": p}, l0, t, s, method="generate_cached",
                   rngs={"latent": jax.random.PRNGKey(2)}).astype(jnp.float32)
    ))
    ms = time_fn(ar, params, latents0, dev_batch["text"], dev_batch["speed"])
    print(json.dumps({"variant": "ar_core", "ms": round(ms, 1)}), flush=True)

    enc = jax.jit(lambda fs, im, r: jnp.sum(
        pipeline.encode_first_stage(im[:, :1], r, fs).astype(jnp.float32)
    ))
    ms = time_fn(enc, fs_vars, dev_batch["images"], jax.random.PRNGKey(3))
    print(json.dumps({"variant": "encode0", "ms": round(ms, 1)}), flush=True)

    # composition cells: the full pipeline minus one stage each, to
    # attribute any gap between `full` and the sum of isolated components
    first = dev_batch["images"][:, 0:1]

    def gen_lat(p, l0):
        return core.apply(
            {"params": p}, l0, dev_batch["text"], dev_batch["speed"],
            method="generate_cached", rngs={"latent": jax.random.PRNGKey(2)},
        )

    ar_dec = jax.jit(lambda p, fs, l0: jnp.sum(
        pipeline.first_stage.decode(gen_lat(p, l0), variables=fs
                                    ).astype(jnp.float32)))
    ms = time_fn(ar_dec, params, fs_vars, latents0)
    print(json.dumps({"variant": "ar_plus_decode", "ms": round(ms, 1)}),
          flush=True)

    ar_dec_cat = jax.jit(lambda p, fs, l0, fr: jnp.sum(jnp.concatenate(
        [fr, pipeline.first_stage.decode(gen_lat(p, l0), variables=fs)], axis=1
    ).astype(jnp.float32)))
    ms = time_fn(ar_dec_cat, params, fs_vars, latents0, first)
    print(json.dumps({"variant": "ar_decode_concat", "ms": round(ms, 1)}),
          flush=True)

    full = jax.jit(lambda p, fs, b, r: jnp.sum(
        pipeline.generate(p, b, r, fs_variables=fs, cached=True).astype(jnp.float32)
    ))
    ms = time_fn(full, params, fs_vars, dev_batch, jax.random.PRNGKey(4))
    knobs = {k: os.environ[k] for k in
             ("MAGE_KL_FRAME_CHUNK", "MAGE_KL_UP", "MAGE_SPATIAL_ATTN",
              "MAGE_CACHED_ATTN") if k in os.environ}
    print(json.dumps({"variant": "full", "ms": round(ms, 1),
                      "fps": round(batch * (frames_length - 1) / (ms / 1e3), 1),
                      "batch": batch, "dtype": str(dtype), "knobs": knobs}),
          flush=True)


if __name__ == "__main__":
    main()
