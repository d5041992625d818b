#!/usr/bin/env python
"""Decompose the KV-cached AR core's step time on the flagship model.

The headline bench (bench.py) showed the AR transformer at ~90 ms for 15
scan steps at batch 32 vs an ~11 ms HBM roofline floor (BENCH_NOTES.md).
This probe times ablated variants of the same jitted scan to attribute the
gap between:

  full          the production step (decode_slot + head + embed + stem)
  t_only        temporal (cached-attention) layers only
  spatial_only  H/W axial blocks only
  trunk_only    decode_slot without head/argmax/embed/stem
  scan_floor    a trivial 15-iteration scan (dispatch/bookkeeping floor)

Usage (real chip): python bench_ar_profile.py
Env: BENCH_BATCH (32), BENCH_DTYPE (bfloat16), MAGE_CACHED_ATTN
(pallas|xla) ablates the attention kernel. Prints one JSON line per
variant. Timing uses the checksum-fetch discipline from bench.py
(block_until_ready does not synchronize through the axon relay).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _prep(core, latents0, text, speed):
    x_emb0, anchor = core._prepare_generation(latents0, text, speed, None)
    return x_emb0, anchor


def _scan_variant(core, x_emb0, anchor, variant: str):
    """Replica of MAGECore.generate_cached's scan with parts ablated."""
    import jax
    import jax.numpy as jnp

    decoder = core.generate_model
    b, _, h, w, c = x_emb0.shape
    cache = decoder.init_cache(b, h, w, x_emb0.dtype)
    _, cache = decoder.decode_slot(anchor, jnp.int32(0), cache, is_anchor=True)
    slot1 = core.stem(x_emb0)[:, 0]

    def decode_ablated(x, pos, cache):
        x = decoder.in_linear(x)
        x = x + jax.lax.dynamic_index_in_dim(
            decoder.T_positional_embedding, pos, axis=0, keepdims=False
        )
        new_cache = dict(cache)
        for i, block in enumerate(decoder.blocks):
            if i % 3 == 0:
                if variant == "spatial_only":
                    continue
                k, v = new_cache[f"layer_{i}"]
                x, k, v = block.incremental_temporal(x, k, v, pos)
                new_cache[f"layer_{i}"] = (k, v)
            else:
                if variant == "t_only":
                    continue
                x = block.single_slot_spatial(x, train=False)
        return x, new_cache

    def step(carry, pos):
        slot_in, cache = carry
        trunk, cache = decode_ablated(slot_in, pos, cache)
        if variant == "trunk_only":
            # keep the loop-carried dependency without head/embed/stem
            return (trunk[..., : slot_in.shape[-1]], cache), trunk[..., 0]
        pred = decoder.head_slot(trunk)
        frame = jnp.argmax(pred, axis=-1).astype(jnp.int32)
        next_emb = core.embed_latents(frame)
        next_slot = core.stem(next_emb[:, None])[:, 0]
        return (next_slot, cache), frame

    _, frames = jax.lax.scan(
        step,
        (slot1, cache),
        jnp.arange(1, core.frames_length, dtype=jnp.int32),
    )
    return jnp.sum(frames.astype(jnp.float32))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_pipeline
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    frames_length = int(os.environ.get("BENCH_FRAMES", "16"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    pipeline = build_pipeline(frames_length)
    core = pipeline.core
    rng = np.random.RandomState(0)
    ctx = core.text_context_length
    res = core.image_resolution  # latent grid side (16 on the flagship)
    latents0 = jnp.asarray(rng.randint(0, 512, (batch, 1, res, res)), jnp.int32)
    text = np.zeros((batch, ctx), np.int32)
    text[:, 0] = 1
    text[:, 1:5] = rng.randint(3, 29, size=(batch, 4))
    text[:, 5] = 2
    text = jnp.asarray(text)
    speed = jnp.asarray(rng.rand(batch), dtype)

    # init through the jitted TRAINING forward: eager init through the
    # relay would standalone-jit the f32 full-size attention kernel (VMEM
    # OOM at f32 tile x full-L cache) and pay hundreds of RTTs. The param
    # tree is identical to generate-path init (tested in
    # tests/test_mage_model.py::test_init_through_generate_returns_concrete_params).
    full_latents = jnp.asarray(
        np.random.RandomState(1).randint(0, 512, (batch, frames_length, res, res)),
        jnp.int32,
    )
    params = jax.jit(
        lambda: core.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(3),
             "latent": jax.random.PRNGKey(1)},
            full_latents, text, speed, train=False,
        )["params"]
    )()
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params
        )

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(5):
        float(trivial(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / 5

    def scan_floor(x):
        def body(c, _):
            return c * 1.0001, c[0, 0, 0]

        _, ys = jax.lax.scan(body, x, None, length=frames_length - 1)
        return jnp.sum(ys)

    # (variant, attention impl) matrix; the impl env is read at trace time,
    # so re-jitting per cell picks it up. Spatial-only has no cached
    # attention, so the impl sweep is skipped there.
    impls = os.environ.get("BENCH_IMPLS", "").split(",")
    impls = [i for i in impls if i] or [os.environ.get("MAGE_CACHED_ATTN", "")]
    cells = [("full", i) for i in impls]
    cells += [("trunk_only", impls[0]), ("t_only", impls[0])]
    cells += [("t_only", i) for i in impls[1:]]
    cells += [("spatial_only", impls[0])]
    for variant, impl in cells:
        if impl:
            os.environ["MAGE_CACHED_ATTN"] = impl
        else:
            os.environ.pop("MAGE_CACHED_ATTN", None)
        fn = jax.jit(
            lambda p, l0, t, s, v=variant: core.apply(
                {"params": p},
                l0,
                t,
                s,
                method=lambda self, a, b, c: _scan_variant(
                    self, *_prep(self, a, b, c), v
                ),
                rngs={"latent": jax.random.PRNGKey(2)},
            )
        )
        float(fn(params, latents0, text, speed))  # compile + warm
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            float(fn(params, latents0, text, speed))
        dt = max((time.perf_counter() - t0) / n - rtt, 0.0)
        print(json.dumps({"variant": variant, "ms": round(dt * 1e3, 2),
                          "impl": impl or "auto"}), flush=True)

    floor = jax.jit(scan_floor)
    x = jnp.ones((8, 8, 8), dtype)
    float(floor(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(floor(x))
    dt = max((time.perf_counter() - t0) / 5 - rtt, 0.0)
    print(json.dumps({"variant": "scan_floor", "ms": round(dt * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
