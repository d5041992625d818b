#!/usr/bin/env python
"""VQ-VAE reconstruction throughput (BASELINE.md: "measured & reported").

Times the jitted encode→decode round trip on device-resident images for
the flagship f8/CATER configuration (128px, dim 256, K=512) and the MNIST
f4 configuration (64px, dim 64 as train_vqvae.py defaults). Prints one
JSON line per config. Checksum-fetch timing (bench.py discipline:
block_until_ready does not synchronize through the axon relay).

Env: BENCH_BATCH (default 128), BENCH_DTYPE (bfloat16).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mage_tpu.models.vqvae import VectorQuantizedVAE
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))

    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(5):
        float(trivial(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / 5

    configs = [
        ("vqvae_f8_cater_128px", dict(input_dim=3, down_ratio=8, dim=256, K=512), 128),
        ("vqvae_f4_mnist_64px", dict(input_dim=1, down_ratio=4, dim=64, K=512), 64),
    ]
    for name, kw, res in configs:
        model = VectorQuantizedVAE(**kw)
        x_host = np.random.RandomState(0).rand(
            batch, res, res, kw["input_dim"]
        ).astype(np.float32) - 0.5
        variables = model.init(jax.random.PRNGKey(0), x_host[:1], train=True)
        if dtype != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            )
        x = jnp.asarray(x_host, dtype)

        # n_inner recon round trips inside ONE dispatch: small configs are
        # faster than the relay's RTT jitter, so a single-iteration fetch
        # measures nothing. The acc -> x feedback (scaled to denormal
        # range) defeats loop-invariant hoisting without changing values.
        n_inner = 20

        @jax.jit
        def recon_checksum(v, x0):
            def body(acc, i):
                # roll by the (traced) iteration index: a real, cheap data
                # dependency the optimizer cannot hoist or CSE away (a
                # denormal-feedback trick underflowed in bf16 and XLA
                # hoisted the whole body -> nonsense numbers)
                xb = jnp.roll(x0, i, axis=0)
                ids = model.apply(v, xb, method="encode", mutable=False)
                out = model.apply(v, ids, method="decode", mutable=False)
                return acc + jnp.sum(out.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(n_inner))
            return acc

        assert np.isfinite(float(recon_checksum(variables, x)))
        n_iter = 3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            float(recon_checksum(variables, x))
        dt = max((time.perf_counter() - t0) / n_iter - rtt, 1e-9) / n_inner
        print(json.dumps({
            "metric": f"{name}_recon_imgs_per_sec_per_chip",
            "value": round(batch / dt, 1),
            "unit": "imgs/s",
            "batch": batch,
            "dtype": str(dtype),
        }), flush=True)


if __name__ == "__main__":
    main()
