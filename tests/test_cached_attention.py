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


# ---- quantized KV cache (MAGE_KV_QUANT) --------------------------------


def test_quantize_kv_slot_round_trip():
    """Per-head symmetric quantization: dequantized codes reconstruct the
    slot within one quantization step of the per-head scale."""
    from mage_tpu.ops.cached_attention import quantize_kv_slot

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(N, D) * np.r_[np.full(D // 2, 0.1),
                                            np.full(D // 2, 5.0)],
                    jnp.float32)
    codes, scale = quantize_kv_slot(x, HEADS, bits=8)
    assert codes.dtype == jnp.int8 and scale.shape == (1, HEADS)
    hd = D // HEADS
    deq = (np.asarray(codes, np.float32).reshape(N, HEADS, hd)
           * np.asarray(scale)[0][None, :, None]).reshape(N, D)
    err = np.abs(deq - np.asarray(x)).reshape(N, HEADS, hd)
    # error <= scale/2 per head (symmetric round-to-nearest)
    assert (err.max(axis=(0, 2)) <= np.asarray(scale)[0] * 0.5 + 1e-6).all()


@pytest.mark.parametrize("bits,tol", [(8, 2e-2), (4, 0.35)])
def test_quant_attention_matches_exact(bits, tol):
    """int8 (and loosely int4) quantized-cache attention tracks the exact
    bf16/f32 path: scales fold into scores/weights exactly, so the only
    error is KV rounding."""
    from mage_tpu.ops.cached_attention import (
        cached_slot_attention_quant,
        quantize_kv_slot,
    )

    q, ck, cv = _inputs(seed=5)
    pos = L - 1
    exact = cached_slot_attention(q, ck, cv, jnp.int32(pos), HEADS, impl="xla")

    ckq = jnp.zeros((L, N, D), jnp.int8 if bits == 8 else jnp.int4)
    cvq = jnp.zeros_like(ckq)
    sk = jnp.zeros((L, HEADS), jnp.float32)
    sv = jnp.zeros((L, HEADS), jnp.float32)
    for l in range(L):
        kc, ks = quantize_kv_slot(ck[l], HEADS, bits)
        vc, vs = quantize_kv_slot(cv[l], HEADS, bits)
        ckq = ckq.at[l].set(kc)
        cvq = cvq.at[l].set(vc)
        sk = sk.at[l].set(ks[0])
        sv = sv.at[l].set(vs[0])

    out = cached_slot_attention_quant(
        q, ckq, cvq, sk, sv, jnp.int32(pos), HEADS
    )
    ref = np.asarray(exact)
    scale = np.abs(ref).mean() + 1e-6
    assert np.abs(np.asarray(out) - ref).mean() / scale < tol


def test_generate_cached_with_quantized_cache(monkeypatch):
    """End to end: MAGE_KV_QUANT=int8 generation on a tiny continuous-head
    model stays close to the exact-cache generation (relative latent MSE
    well under the signal power)."""
    from mage_tpu.models.mage import FlatAxialDecoder

    dec = FlatAxialDecoder(
        in_channels=4, model_channels=64, out_channels=4, frames_length=5,
        layers=3, context_channels=6, use_cids=False, dropout=0.0,
    )
    rng = np.random.RandomState(7)
    anchor = jnp.asarray(rng.randn(2, 4, 4, 6), jnp.float32)
    slots = jnp.asarray(rng.randn(4, 2, 4, 4, 4), jnp.float32)

    def run(variables):
        cache = dec.apply(variables, 2, 4, 4, method=dec.init_cache)
        _, cache = dec.apply(
            variables, anchor, jnp.int32(0), cache, True,
            method=dec.decode_slot,
        )
        outs = []
        for p in range(1, 5):
            trunk, cache = dec.apply(
                variables, slots[p - 1], jnp.int32(p), cache,
                method=dec.decode_slot,
            )
            outs.append(trunk)
        return np.asarray(jnp.stack(outs))

    variables = dec.init(
        jax.random.PRNGKey(0), anchor, slots.transpose(1, 0, 2, 3, 4)
    )
    exact = run(variables)
    monkeypatch.setenv("MAGE_KV_QUANT", "int8")
    quant = run(variables)
    rel = ((exact - quant) ** 2).mean() / ((exact ** 2).mean() + 1e-9)
    assert rel < 1e-3, rel

    monkeypatch.setenv("MAGE_KV_QUANT", "bogus")
    with pytest.raises(ValueError):
        dec.apply(variables, 2, 4, 4, method=dec.init_cache)
