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

BENCH_MODE=convs isolates XLA's conv efficiency: a skeleton with exactly
the decoder's conv3x3 / nin-1x1 / dilated-up-conv shapes and residual
adds but NO GroupNorm/silu/attention. Against the 12.32 TFLOP chunk at
the 331 TFLOP/s matmul peak (~37 ms/chunk floor; full decode measured
~69 ms/chunk), this splits the gap into "conv lowering efficiency" vs
"pointwise/GN overhead" — the decision input for a fused GN+silu+conv
Pallas kernel vs a pointwise-fusion attack.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _conv_skeleton():
    """Decoder-shaped conv stack (no GN/silu/attn): conv_in + 2 mid res +
    (3 res + up-conv) x levels [512, 512, 256] + 3 res at 128 + conv_out,
    residual adds kept. Shapes match AutoencoderKL's 128px decoder exactly
    (ch=128, ch_mult [1,2,4,4], num_res_blocks=2)."""
    import flax.linen as nn

    from mage_tpu.models.autoencoder_kl import _DilatedUpConv

    class ConvStack(nn.Module):
        @nn.compact
        def __call__(self, z):
            def res(h, cout, tag):
                x = h
                h = nn.Conv(cout, (3, 3), padding=1, name=f"{tag}_c1")(h)
                h = nn.Conv(cout, (3, 3), padding=1, name=f"{tag}_c2")(h)
                if x.shape[-1] != cout:
                    x = nn.Conv(cout, (1, 1), name=f"{tag}_nin")(x)
                return x + h

            h = nn.Conv(512, (3, 3), padding=1, name="conv_in")(z)
            for j in range(2):
                h = res(h, 512, f"mid{j}")
            for i, cout in ((3, 512), (2, 512), (1, 256), (0, 128)):
                for j in range(3):
                    h = res(h, cout, f"up{i}b{j}")
                if i != 0:
                    h = _DilatedUpConv(h.shape[-1], name=f"up{i}_conv")(h)
            return nn.Conv(3, (3, 3), padding=1, name="conv_out")(h)

    return ConvStack()


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

    if os.environ.get("BENCH_MODE") == "convs":
        chunk = int(os.environ.get("MAGE_KL_FRAME_CHUNK", "96"))
        model = _conv_skeleton()
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4), dtype)
        )
        if dtype != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            )
        z = jnp.asarray(np.random.RandomState(0).randn(chunk, 16, 16, 4),
                        dtype)

        def chunk_checksum(v, z):
            return jnp.sum(model.apply(v, z).astype(jnp.float32))

        dec = jax.jit(chunk_checksum)
        c0 = float(dec(variables, z))
        assert np.isfinite(c0)
        iters = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(dec(variables, z))
            iters.append(max(time.perf_counter() - t0 - rtt, 1e-9))
        dt = float(np.mean(iters))
        print(json.dumps({
            "metric": "kl_decoder_convs_only_ms_per_chunk",
            "value": round(dt * 1e3, 1), "unit": "ms",
            "chunk_frames": chunk, "dtype": str(dtype),
            "per_iter_ms": [round(t * 1e3, 1) for t in iters],
            "frames_per_sec_equiv": round(chunk / dt, 1),
            "rtt_ms": round(rtt * 1e3, 1),
            "note": "decoder conv/residual shapes only, no GN/silu/attn; "
                    "matmul-peak floor ~37 ms at chunk 96, full decode "
                    "measured ~69 ms/chunk",
        }), flush=True)
        return

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
        # "dilated+gnconv:96" additionally routes ResnetBlock chains
        # through the fused GN+silu+conv Pallas kernel (ops/gn_conv.py)
        if "+" in up:
            up, fused = up.split("+")
            os.environ["MAGE_KL_FUSED"] = fused
        else:
            os.environ.pop("MAGE_KL_FUSED", None)
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
