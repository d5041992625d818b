#!/usr/bin/env python
"""KL-AE (MAGE+ first stage) pixel-decoder throughput probe.

The MAGE+ generation headline is bounded by decoding 480 generated
16x16x4 latents to 128px frames through the CATER-scale AutoencoderKL
decoder (BENCH_NOTES.md: ~0.5 s of the 0.587 s generate call). This
micro-bench times exactly that decode — the same ``FirstStageKL.decode``
chunking path ``pipeline.generate`` uses — so decoder variants
(MAGE_KL_UP=phased|naive) and MAGE_KL_FRAME_CHUNK sweeps iterate in
minutes instead of recompiling the full sampler program.

One JSON line per variant. Checksum-fetch timing minus median RTT
(bench.py discipline). Env: BENCH_FRAMES (default 480, = batch 32 x 15
generated), BENCH_DTYPE (bfloat16), BENCH_SWEEP ("phased:96,phased:160,
naive:96"-style list; default a standard sweep).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mage_tpu.models.autoencoder_kl import FirstStageKL
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    frames = int(os.environ.get("BENCH_FRAMES", "480"))
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    sweep = os.environ.get(
        "BENCH_SWEEP", "naive:96,phased:96,phased:120,phased:160,phased:240"
    )

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    rtts = []
    for i in range(15):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(i)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    # the reference MAGE+ ddconfig (config/mage+_caterv2.yaml:28-44)
    ddconfig = dict(
        double_z=True, z_channels=4, resolution=128, in_channels=3, out_ch=3,
        ch=128, ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
    )
    fs = FirstStageKL.from_config({"embed_dim": 4, "ddconfig": ddconfig})
    variables = fs.variables
    if dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables,
        )
    lat = jnp.asarray(
        np.random.RandomState(0).randn(1, frames, 16, 16, 4), dtype
    )

    results = {}
    for variant in sweep.split(","):
        up, chunk = variant.split(":")
        os.environ["MAGE_KL_UP"] = up
        os.environ["MAGE_KL_FRAME_CHUNK"] = chunk

        def decode_checksum(v, z):
            out = fs.decode(z, variables=v)
            return jnp.sum(out.astype(jnp.float32))

        dec = jax.jit(decode_checksum)
        c0 = float(dec(variables, lat))
        assert np.isfinite(c0), variant
        n_iter = 5
        iters = []
        for _ in range(n_iter):
            t0 = time.perf_counter()
            float(dec(variables, lat))
            iters.append(max(time.perf_counter() - t0 - rtt, 1e-9))
        dt = float(np.mean(iters))
        results[variant] = frames / dt
        print(json.dumps({
            "metric": "kl_f8_decode_128px_frames_per_sec_per_chip",
            "variant": variant, "value": round(frames / dt, 1),
            "unit": "frames/s", "frames": frames, "dtype": str(dtype),
            "per_iter_ms": [round(t * 1e3, 1) for t in iters],
            "rtt_ms": round(rtt * 1e3, 1), "checksum": c0,
        }), flush=True)
    best = max(results, key=results.get)
    print(json.dumps({"best_variant": best,
                      "value": round(results[best], 1)}), flush=True)


if __name__ == "__main__":
    main()
