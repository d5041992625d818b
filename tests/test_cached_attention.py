"""Fused cached-slot attention: the flat-layout op must match the plain
MultiHeadAttention math exactly (XLA fallback) and the Pallas kernel
(interpret mode) must match the fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.ops.cached_attention import (
    _attn_pallas,
    _attn_xla,
    cached_slot_attention,
)

N, L, D, HEADS = 48, 6, 64, 2


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(N, D), dtype)
    ck = jnp.asarray(rng.randn(L, N, D), dtype)
    cv = jnp.asarray(rng.randn(L, N, D), dtype)
    return q, ck, cv


def _reference(q, ck, cv, pos):
    """Straight softmax(q.K^T/sqrt(hd)+causal).V per head, dense layout."""
    hd = D // HEADS
    qh = np.asarray(q).reshape(N, HEADS, hd)
    kh = np.asarray(ck).reshape(L, N, HEADS, hd).transpose(1, 2, 0, 3)
    vh = np.asarray(cv).reshape(L, N, HEADS, hd).transpose(1, 2, 0, 3)
    scores = np.einsum("nhd,nhkd->nhk", qh, kh) / np.sqrt(hd)
    scores = scores + np.where(np.arange(L) <= pos, 0.0, -1e9)[None, None]
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("nhk,nhkd->nhd", w, vh).reshape(N, D)


@pytest.mark.parametrize("pos", [0, 2, L - 1])
def test_xla_fallback_matches_dense_reference(pos):
    q, ck, cv = _inputs()
    out = cached_slot_attention(q, ck, cv, jnp.int32(pos), HEADS, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out), _reference(q, ck, cv, pos), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("pos", [0, 3, L - 1])
def test_pallas_interpret_matches_xla(pos):
    q, ck, cv = _inputs(seed=1)
    bias = jnp.where(jnp.arange(L)[None, :] <= pos, 0.0, -1e9).astype(jnp.float32)
    out_k = _attn_pallas(q, ck, cv, bias, HEADS, tile_n=16, interpret=True)
    out_x = _attn_xla(q, ck, cv, bias, HEADS)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-6
    )


def test_pallas_interpret_pads_ragged_n():
    q, ck, cv = _inputs(seed=2)
    bias = jnp.zeros((1, L), jnp.float32)
    # N=48 with tile 32 -> padded to 64; padding must not leak into rows
    out_k = _attn_pallas(q, ck, cv, bias, HEADS, tile_n=32, interpret=True)
    out_x = _attn_xla(q, ck, cv, bias, HEADS)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("pos", [0, 3, L - 1])
def test_pallas_v2_interpret_matches_xla(pos):
    """The full-lane indicator-matmul kernel must be numerically identical
    to the per-head-slice kernel / XLA math."""
    q, ck, cv = _inputs(seed=3)
    bias = jnp.where(jnp.arange(L)[None, :] <= pos, 0.0, -1e9).astype(jnp.float32)
    out_k = _attn_pallas(q, ck, cv, bias, HEADS, tile_n=16, interpret=True,
                         version=2)
    out_x = _attn_xla(q, ck, cv, bias, HEADS)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=1e-5, atol=1e-6
    )


def test_pallas_v2_interpret_ragged_and_dispatch():
    q, ck, cv = _inputs(seed=4)
    out_d = cached_slot_attention(q, ck, cv, jnp.int32(L - 1), HEADS,
                                  impl="pallas2_interpret")
    out_x = cached_slot_attention(q, ck, cv, jnp.int32(L - 1), HEADS, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_x), rtol=1e-5, atol=1e-6
    )


def test_pallas_partitions_without_gather(mesh8):
    """Under a batch-sharded mesh the custom_partitioning wrapper must
    split the kernel row-parallel: identical numerics to the replicated
    run and NO gather/collective materializing the full cache."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, ck, cv = _inputs(seed=5)
    pos = jnp.int32(L - 1)
    ns = NamedSharding(mesh8, P("data", None))
    cs = NamedSharding(mesh8, P(None, "data", None))
    qs = jax.device_put(q, ns)
    cks = jax.device_put(ck, cs)
    cvs = jax.device_put(cv, cs)

    fn = jax.jit(
        lambda a, b, c: cached_slot_attention(
            a, b, c, pos, HEADS, impl="pallas_interpret"
        ),
        in_shardings=(ns, cs, cs),
        out_shardings=ns,
    )
    out_sharded = fn(qs, cks, cvs)
    out_ref = cached_slot_attention(q, ck, cv, pos, HEADS, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )
    hlo = fn.lower(qs, cks, cvs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, coll
