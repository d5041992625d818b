"""Fused single-slot attention over a time-major KV cache.

The AR sampler's temporal layers attend ONE new query slot against a
(L, N, D) cache (L = frames incl. anchor, N = batch*h*w tokens, D =
d_model). The reference architecture fixes heads = D/32 (reference
modules/mage_model.py:109,191: ``heads = d_model // 32``), i.e. head_dim
32 — and every (..., heads, 32) tensor on TPU pads its 32-wide minor dim
to the 128-lane tile, a 4x expansion of the dominant HBM traffic of the
decode step (measured in the bench OOM dumps: 256 MB unpadded -> 1 GB
padded). This kernel keeps the cache and all HBM-resident operands in
flat (…, D) layout — no padding — and splits heads only inside VMEM.

Per CLAUDE.md hard-won Mosaic/v5e rules every kernel intermediate stays
2-D (1-D shapes trigger register-spill VMEM blowups); the per-head
score/value loops are static unrolls over L (<= ~20) and heads.

``cached_slot_attention`` defaults to the XLA einsum path — the exact
reference math (softmax(q.K^T/sqrt(hd) + causal bias).V per head), and
the fastest end-to-end on v5e at flagship shapes (BENCH_NOTES.md:
3509 f/s vs 3326 for the best kernel) — with two opt-in Pallas kernels
(`MAGE_CACHED_ATTN=pallas|pallas2`): v1 per-head-slice, v2 full-lane
with indicator-matmul head reductions. The kernels keep all HBM operands
unpadded and are candidates for longer-L / wider-D regimes where the
(..., heads, 32) padding dominates.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _attn_kernel(n_head: int, q_ref, k_ref, v_ref, bias_ref, o_ref):
    """(BN, D) query tile x (L, BN, D) cache tiles -> (BN, D) output.

    bias_ref: (1, L) additive causal bias (0 for valid keys, -1e9 beyond
    ``pos``). Scores/weights are computed in f32 for stable softmax and the
    output is cast back to the cache dtype.
    """
    length = k_ref.shape[0]
    d = q_ref.shape[1]
    hd = d // n_head
    scale = 1.0 / (hd ** 0.5)
    bias = bias_ref[:, :].astype(jnp.float32)  # (1, L)
    for h in range(n_head):
        sl = slice(h * hd, (h + 1) * hd)
        q_h = q_ref[:, sl].astype(jnp.float32) * scale  # (BN, hd)
        cols = [
            jnp.sum(q_h * k_ref[l, :, sl].astype(jnp.float32), axis=1,
                    keepdims=True)
            for l in range(length)
        ]
        scores = jnp.concatenate(cols, axis=1) + bias  # (BN, L)
        w = jax.nn.softmax(scores, axis=-1)
        acc = w[:, 0:1] * v_ref[0, :, sl].astype(jnp.float32)
        for l in range(1, length):
            acc = acc + w[:, l:l + 1] * v_ref[l, :, sl].astype(jnp.float32)
        o_ref[:, sl] = acc.astype(o_ref.dtype)


def _attn_kernel_v2(n_head: int, q_ref, k_ref, v_ref, bias_ref, o_ref, s_ref):
    """Full-lane variant of ``_attn_kernel``: every VPU op runs on the flat
    (tile_n, D) layout (100% lane utilization at D >= 128) and the per-head
    segment reductions go through the MXU as matmuls with block-diagonal
    0/1 indicator matrices, instead of 2 x heads x L quarter-lane
    (tile_n, head_dim) slice ops. Three statically unrolled passes over L:
    scores (+running max), exp/normalizer, weighted values.

    s_ref: (tile_n, L * n_head) f32 scratch holding all heads' scores,
    L-major (column l * n_head + h).
    """
    length = k_ref.shape[0]
    d = q_ref.shape[1]
    hd = d // n_head
    scale = 1.0 / (hd**0.5)

    # head indicator: seg[c, h] = 1 iff channel c belongs to head h
    ch = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 0)
    hh = jax.lax.broadcasted_iota(jnp.int32, (d, n_head), 1)
    seg = (ch // hd == hh).astype(jnp.float32)  # (D, H)

    q = q_ref[:, :].astype(jnp.float32) * scale  # (N, D)
    m = jnp.full((q.shape[0], n_head), NEG_INF, jnp.float32)
    for l in range(length):
        qk = q * k_ref[l, :, :].astype(jnp.float32)  # (N, D) full-lane
        scores = (
            jnp.dot(qk, seg, preferred_element_type=jnp.float32)
            + bias_ref[0, l].astype(jnp.float32)
        )  # (N, H)
        s_ref[:, l * n_head : (l + 1) * n_head] = scores
        m = jnp.maximum(m, scores)
    z = jnp.zeros_like(m)
    for l in range(length):
        e = jnp.exp(s_ref[:, l * n_head : (l + 1) * n_head] - m)
        s_ref[:, l * n_head : (l + 1) * n_head] = e
        z = z + e
    acc = jnp.zeros(q.shape, jnp.float32)
    segT = seg.T  # (H, D)
    for l in range(length):
        w = s_ref[:, l * n_head : (l + 1) * n_head] / z  # (N, H)
        w_full = jnp.dot(w, segT, preferred_element_type=jnp.float32)
        acc = acc + w_full * v_ref[l, :, :].astype(jnp.float32)
    o_ref[:, :] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "tile_n", "interpret", "version")
)
def _attn_pallas(q, cache_k, cache_v, bias, n_head, tile_n=128, interpret=False,
                 version=1):
    # VMEM budget: K+V blocks are 2 * L * tile_n * D * itemsize — at the
    # flagship shape (L=16, D=512) tile 128 keeps f32 under 9 MB (bf16 4.5)
    n, d = q.shape
    length = cache_k.shape[0]
    n_pad = _cdiv(max(n, 8), tile_n) * tile_n
    if n_pad != n:
        q = jnp.pad(q, ((0, n_pad - n), (0, 0)))
        cache_k = jnp.pad(cache_k, ((0, 0), (0, n_pad - n), (0, 0)))
        cache_v = jnp.pad(cache_v, ((0, 0), (0, n_pad - n), (0, 0)))
    grid = (n_pad // tile_n,)
    kernel = (
        functools.partial(_attn_kernel, n_head)
        if version == 1
        else functools.partial(_attn_kernel_v2, n_head)
    )
    scratch = (
        []
        if version == 1
        else [pltpu.VMEM((tile_n, length * n_head), jnp.float32)]
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((length, tile_n, d), lambda i: (0, i, 0)),
            pl.BlockSpec((length, tile_n, d), lambda i: (0, i, 0)),
            pl.BlockSpec((1, length), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), q.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, cache_k, cache_v, bias)
    return out[:n]


@functools.lru_cache(maxsize=None)
def _sharded_attn(n_head: int, version: int, interpret: bool):
    """GSPMD-partitionable wrapper for the Pallas kernel.

    A bare pallas_call lowers to a custom call XLA cannot split, so under a
    batch-sharded mesh GSPMD would all-gather the whole (L, N, D) cache
    around it. The op is embarrassingly row-parallel over N (= batch*h*w;
    batch sharding shards N), so custom_partitioning declares exactly that:
    each device runs the kernel on its N-rows; L, D, and the bias stay
    replicated. The sharding_rule covers the shardy partitioner (JAX >= 0.9
    default); partition/infer cover GSPMD."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def attn(q, ck, cv, bias):
        return _attn_pallas(q, ck, cv, bias, n_head,
                            tile_n=_pick_tile(q.shape[0]),
                            interpret=interpret, version=version)

    def _n_axis(arg_shapes):
        qs = getattr(arg_shapes[0].sharding, "spec", None)
        if qs and len(qs) > 0 and qs[0] is not None:
            return qs[0]
        ks = getattr(arg_shapes[1].sharding, "spec", None)
        if ks and len(ks) > 1 and ks[1] is not None:
            return ks[1]
        return None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_n_axis(arg_shapes), None))

    def partition(mesh, arg_shapes, result_shape):
        n = _n_axis(arg_shapes)
        arg_shardings = (
            NamedSharding(mesh, P(n, None)),
            NamedSharding(mesh, P(None, n, None)),
            NamedSharding(mesh, P(None, n, None)),
            NamedSharding(mesh, P(None, None)),
        )

        def lower(q, ck, cv, bias):
            return _attn_pallas(q, ck, cv, bias, n_head,
                                tile_n=_pick_tile(q.shape[0]),
                                interpret=interpret, version=version)

        return mesh, lower, NamedSharding(mesh, P(n, None)), arg_shardings

    attn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # factors: i = N rows (partitionable), d/l/u replicated dims
        sharding_rule="i d, l i d, l i d, u l -> i d",
    )
    return attn


# ---- quantized KV cache (opt-in; MAGE_KV_QUANT in the sampler) ---------

def quantize_kv_slot(x: jax.Array, n_head: int, bits: int = 8):
    """Symmetric per-head quantization of ONE new cache slot.

    x (N, D) bf16/f32 -> (codes (N, D) int8|int4, scale (1, n_head) f32).
    The decode step's dominant HBM traffic is streaming the whole (L, N, D)
    K+V cache per temporal layer (BENCH_NOTES.md AR-core decomposition:
    ~0.34 ms/call for 268 MB bf16 — already at HBM speed-of-light), so
    shrinking the stored bytes is the only remaining lever. Per-head,
    per-slot scales cost (L, H) f32 — nothing — and are applied to the
    (N, H, L) scores/weights AFTER the dots (see
    cached_slot_attention_quant), so the attention inner loops keep the
    flat unpadded (…, D) layout."""
    n, d = x.shape
    hd = d // n_head
    qmax = float(2 ** (bits - 1) - 1)
    xf = x.astype(jnp.float32).reshape(n, n_head, hd)
    amax = jnp.max(jnp.abs(xf), axis=(0, 2))  # (H,)
    scale = jnp.maximum(amax, 1e-8) / qmax
    codes = jnp.clip(jnp.round(xf / scale[None, :, None]), -qmax, qmax)
    dtype = jnp.int8 if bits == 8 else jnp.int4
    return codes.reshape(n, d).astype(dtype), scale[None, :]


def cached_slot_attention_quant(
    q: jax.Array,  # (N, D) — the new slot's queries, heads merged
    cache_k: jax.Array,  # (L, N, D) int8/int4 codes
    cache_v: jax.Array,
    scale_k: jax.Array,  # (L, n_head) f32 per-slot-per-head scales
    scale_v: jax.Array,
    pos: jax.Array,
    n_head: int,
) -> jax.Array:
    """``cached_slot_attention`` over a quantized cache — same math with
    the dequantization scales folded into the scores (K) and the softmax
    weights (V): scores[n,h,l] *= scale_k[l,h] before softmax and
    w[n,h,l] *= scale_v[l,h] before the value sum, which is exact for
    per-(slot, head)-constant scales."""
    n, d = q.shape
    length = cache_k.shape[0]
    hd = d // n_head
    bias = jnp.where(
        jnp.arange(length)[None, :] <= pos, 0.0, NEG_INF
    ).astype(jnp.float32)
    qh = q.reshape(n, n_head, hd)
    kh = cache_k.reshape(length, n, n_head, hd).astype(q.dtype)
    vh = cache_v.reshape(length, n, n_head, hd).astype(q.dtype)
    scores = jnp.einsum("nhd,knhd->nhk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, q.dtype)
    )
    scores = scores * scale_k.T[None].astype(scores.dtype)  # (1, H, L)
    scores = scores + bias.reshape(1, 1, length).astype(scores.dtype)
    w = jax.nn.softmax(scores, axis=-1)
    w = w * scale_v.T[None].astype(w.dtype)
    out = jnp.einsum("nhk,knhd->nhd", w, vh)
    return out.reshape(n, d)


def _attn_xla(q, cache_k, cache_v, bias, n_head):
    """Exact reference attention math on the flat layout."""
    n, d = q.shape
    length = cache_k.shape[0]
    hd = d // n_head
    qh = q.reshape(n, n_head, hd)
    kh = cache_k.reshape(length, n, n_head, hd)
    vh = cache_v.reshape(length, n, n_head, hd)
    scores = jnp.einsum("nhd,knhd->nhk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, q.dtype)
    )
    scores = scores + bias.reshape(1, 1, length).astype(scores.dtype)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhk,knhd->nhd", w, vh)
    return out.reshape(n, d)


def _use_pallas_default() -> bool:
    """Measured on v5e at flagship shapes (L=16, N=8192, D=512, bf16,
    BENCH_NOTES.md): end-to-end generation is 3509 f/s with the XLA
    attention vs 3326 (v2 kernel) / 1588 (v1, tile 32) — XLA's fused
    einsum wins at these small per-slot attention shapes, so it is the
    default everywhere; MAGE_CACHED_ATTN=pallas2|pallas opts into the
    kernels (candidates for larger L/D regimes)."""
    return False


def _pick_tile(n: int, cap: int | None = None) -> int:
    """Largest multiple-of-8 divisor of ``n`` up to ``cap`` — a tile that
    divides N exactly avoids jnp.pad materializing a copy of the whole
    (L, N, D) cache on every call (the traffic this kernel exists to cut).

    The default cap (overridable via MAGE_ATTN_TILE) keeps the kernel's
    scoped-VMEM footprint — double-buffered (L, tile, D) K/V blocks PLUS
    the full (N, D) output, which XLA's memory-space assignment likes to
    keep in VMEM (S(1)) when the consumer is adjacent — under the 16 MB
    v5e budget at flagship shapes (L=16, D=512, N=8192 bf16); measured
    empirically on hardware, see BENCH_NOTES.md."""
    import os

    if cap is None:
        cap = int(os.environ.get("MAGE_ATTN_TILE", "32"))
    for t in range(min(cap, n), 7, -1):
        if n % t == 0 and t % 8 == 0:
            return t
    return 8  # ragged N: smallest aligned tile, pad one short tail tile


def cached_slot_attention(
    q: jax.Array,  # (N, D) — the new slot's queries, heads merged
    cache_k: jax.Array,  # (L, N, D) time-major flat cache
    cache_v: jax.Array,
    pos: jax.Array,  # scalar: current slot index; keys > pos are masked
    n_head: int,
    *,
    impl: Literal["auto", "pallas", "xla", "pallas_interpret"] = "auto",
) -> jax.Array:
    """Single-slot causal multi-head attention against the cache -> (N, D).

    Sharding: the Pallas path is wrapped in ``custom_partitioning``
    declaring row-parallelism over N, so batch-sharded meshes split the
    kernel across devices with no collectives (tested in
    tests/test_cached_attention.py::test_pallas_partitions_without_gather).
    """
    length = cache_k.shape[0]
    bias = jnp.where(
        jnp.arange(length)[None, :] <= pos, 0.0, NEG_INF
    ).astype(jnp.float32)
    if impl == "auto":
        import os

        impl = os.environ.get(
            "MAGE_CACHED_ATTN", "pallas" if _use_pallas_default() else "xla"
        )
    versions = {"pallas": 1, "pallas2": 2,
                "pallas_interpret": 1, "pallas2_interpret": 2}
    raw = {"pallas_raw": 1, "pallas2_raw": 2}  # skip custom_partitioning
    if impl != "xla" and impl not in versions and impl not in raw:
        raise ValueError(
            "MAGE_CACHED_ATTN/impl must be xla|pallas|pallas2"
            "|pallas_interpret|pallas2_interpret|pallas_raw|pallas2_raw, "
            f"got {impl!r}"
        )
    if impl in raw:
        return _attn_pallas(q, cache_k, cache_v, bias, n_head,
                            tile_n=_pick_tile(q.shape[0]), version=raw[impl])
    if impl in versions:
        # custom_partitioning's partition callbacks are Python, which
        # remote/AOT compile services cannot invoke — and a single-device
        # program has nothing to partition. Engage the wrapper only when
        # several devices are visible (the multi-chip serving/test path).
        if jax.device_count() > 1:
            return _sharded_attn(
                n_head, versions[impl], impl.endswith("_interpret")
            )(q, cache_k, cache_v, bias)
        return _attn_pallas(q, cache_k, cache_v, bias, n_head,
                            tile_n=_pick_tile(q.shape[0]),
                            interpret=impl.endswith("_interpret"),
                            version=versions[impl])
    return _attn_xla(q, cache_k, cache_v, bias, n_head)
