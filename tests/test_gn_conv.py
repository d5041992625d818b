"""Parity tests for the fused GroupNorm->silu->conv3x3 kernel
(mage_tpu/ops/gn_conv.py) against flax's unfused chain — the exact
ResnetBlock site it replaces (models/autoencoder_kl.py:53-69)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.ops.gn_conv import (
    gn_affine_rows,
    gn_silu_conv3x3,
    gn_silu_conv3x3_xla,
)


def _rand(rng, shape, dtype=jnp.float32, scale=1.0):
    return jnp.asarray(rng.randn(*shape) * scale, dtype)


def _flax_chain(x, gamma, beta, kernel, bias, eps=1e-6):
    """The literal decoder chain: nn.GroupNorm -> silu -> nn.Conv."""
    gn = nn.GroupNorm(num_groups=32, epsilon=eps)
    h = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    h = nn.silu(h)
    conv = nn.Conv(kernel.shape[-1], (3, 3), padding=1)
    return conv.apply({"params": {"kernel": kernel, "bias": bias}}, h)


@pytest.mark.parametrize(
    "B,H,W,C,Cout,row_tile",
    [
        (2, 16, 16, 512, 512, 32),   # mid/level-3 shape (single row block)
        (1, 32, 32, 512, 512, 16),   # level-2 shape, 2 blocks
        (1, 64, 64, 512, 256, 32),   # level-1 first block: channel change
        (2, 8, 8, 128, 128, 4),      # small, many blocks
    ],
)
def test_fused_matches_flax_f32(B, H, W, C, Cout, row_tile):
    rng = np.random.RandomState(0)
    x = _rand(rng, (B, H, W, C))
    gamma = _rand(rng, (C,), scale=0.5) + 1.0
    beta = _rand(rng, (C,), scale=0.2)
    kernel = _rand(rng, (3, 3, C, Cout), scale=1.0 / np.sqrt(9 * C))
    bias = _rand(rng, (Cout,), scale=0.1)

    want = _flax_chain(x, gamma, beta, kernel, bias)
    got = gn_silu_conv3x3(x, gamma, beta, kernel, bias,
                          row_tile=row_tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    oracle = gn_silu_conv3x3_xla(x, gamma, beta, kernel, bias)
    np.testing.assert_allclose(np.asarray(oracle), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_matches_oracle_bf16():
    rng = np.random.RandomState(1)
    B, H, W, C, Cout = 2, 16, 16, 128, 128
    x = _rand(rng, (B, H, W, C), jnp.bfloat16)
    gamma = _rand(rng, (C,), scale=0.5) + 1.0
    beta = _rand(rng, (C,), scale=0.2)
    kernel = _rand(rng, (3, 3, C, Cout), scale=1.0 / np.sqrt(9 * C))
    bias = _rand(rng, (Cout,), scale=0.1)
    got = gn_silu_conv3x3(x, gamma, beta, kernel, bias,
                          row_tile=8, interpret=True)
    want = gn_silu_conv3x3_xla(x, gamma, beta, kernel, bias)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.06, atol=0.06,
    )


def test_affine_rows_reproduce_groupnorm():
    rng = np.random.RandomState(2)
    B, H, W, C = 3, 8, 8, 64
    x = _rand(rng, (B, H, W, C))
    gamma = _rand(rng, (C,), scale=0.5) + 1.0
    beta = _rand(rng, (C,), scale=0.2)
    a, b = gn_affine_rows(x, gamma, beta, groups=32, eps=1e-6)
    want = nn.GroupNorm(num_groups=32, epsilon=1e-6).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    got = x * a[:, None, None, :] + b[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
