"""Fused within-slot axial attention (no mask) on a flat (G, S, D) layout.

The sampler's H/W-axis blocks attend over one short axis (S = latent grid
side, 16 at flagship) for G = batch*other_axis independent groups. The
XLA path materializes (..., heads, 32) tensors whose 32-wide minor dim
pads 4x to the TPU's 128-lane tile; this kernel keeps HBM operands flat
(G, S, D) and splits heads only inside VMEM, using Mosaic's batched
``dot_general`` (verified working on v5e) for the (S x S) score and value
matmuls per head.

This kernel is the DEFAULT for bf16 eval-mode blocks on TPU (see
AxialAttentionBlock / MAGE_SPATIAL_ATTN): it cut the AR core from 80 to
55.9 ms and lifted end-to-end generation 3509 -> 3740 f/s
(BENCH_NOTES.md). ``MAGE_AXIAL_TILE`` caps the row tile (default 64).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _axial_kernel(n_head: int, q_ref, k_ref, v_ref, o_ref):
    d = q_ref.shape[-1]
    hd = d // n_head
    scale = 1.0 / (hd**0.5)
    for h in range(n_head):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, :, sl].astype(jnp.float32) * scale  # (G, S, hd)
        kh = k_ref[:, :, sl].astype(jnp.float32)
        vh = v_ref[:, :, sl].astype(jnp.float32)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, S, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            w, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, S, hd)
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _pick_tile(g: int, cap: int | None = None) -> int:
    """Shared divisor-search from ops/cached_attention; this kernel's cap
    (MAGE_AXIAL_TILE, default 64) is separate from the cached kernel's
    MAGE_ATTN_TILE because its VMEM footprint is S x larger per row."""
    import os

    from mage_tpu.ops.cached_attention import _pick_tile as _base

    if cap is None:
        cap = int(os.environ.get("MAGE_AXIAL_TILE", "64"))
    return _base(g, cap)


@functools.partial(jax.jit, static_argnames=("n_head", "tile_g", "interpret"))
def _axial_pallas(q, k, v, n_head, tile_g=64, interpret=False):
    g, s, d = q.shape
    pad = (-g) % tile_g
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    grid = ((g + pad) // tile_g,)
    spec = pl.BlockSpec((tile_g, s, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_axial_kernel, n_head),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g + pad, s, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:g]


@functools.lru_cache(maxsize=None)
def _sharded_axial(n_head: int, interpret: bool):
    """Row-parallel (over G) custom_partitioning wrapper — same pattern
    and rationale as ops/cached_attention.py::_sharded_attn; engaged only
    at >1 device (Python partition callbacks break remote AOT compile)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def attn(q, k, v):
        return _axial_pallas(q, k, v, n_head,
                             tile_g=_pick_tile(q.shape[0]),
                             interpret=interpret)

    def _g_axis(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        return spec[0] if spec and len(spec) > 0 else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_g_axis(arg_shapes), None, None))

    def partition(mesh, arg_shapes, result_shape):
        g = _g_axis(arg_shapes)
        sh = NamedSharding(mesh, P(g, None, None))

        def lower(q, k, v):
            return _axial_pallas(q, k, v, n_head,
                                 tile_g=_pick_tile(q.shape[0]),
                                 interpret=interpret)

        return mesh, lower, sh, (sh, sh, sh)

    attn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="g s d, g s d, g s d -> g s d",
    )
    return attn


def _axial_xla(q, k, v, n_head):
    g, s, d = q.shape
    hd = d // n_head
    qh = q.reshape(g, s, n_head, hd)
    kh = k.reshape(g, s, n_head, hd)
    vh = v.reshape(g, s, n_head, hd)
    scores = jnp.einsum("gqhd,gkhd->ghqk", qh, kh) / jnp.sqrt(
        jnp.asarray(hd, q.dtype)
    )
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("ghqk,gkhd->gqhd", w, vh).reshape(g, s, d)


def _block_kernel(n_head: int, eps: float,
                  x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                  wv_ref, bv_ref, wo_ref, bo_ref, g2_ref, b2_ref,
                  wfc_ref, bfc_ref, wp_ref, bp_ref, o_ref):
    """Whole pre-LN transformer block on a (tile_g, S, D) tile:
    LN1 -> QKV -> per-head attention -> out-proj -> +residual -> LN2 ->
    MLP (QuickGELU) -> +residual. Matmuls accumulate f32 on the MXU;
    LayerNorm moments are f32; inter-stage tensors stay in x.dtype so the
    whole block lives in VMEM (the XLA path materializes ~10 HBM tensors
    per invocation — see BENCH_NOTES.md AR-core decomposition)."""
    t, s, d = x_ref.shape
    hd = d // n_head
    scale = 1.0 / (hd**0.5)
    x = x_ref[...].reshape(t * s, d)
    dtype = x.dtype

    def ln(y2, g_ref, b_ref):
        # y2 (R, D); scales/biases arrive 2-D as (1, F) (1-D intermediates
        # register-spill on v5e Mosaic — CLAUDE.md)
        yf = y2.astype(jnp.float32)
        mu = jnp.mean(yf, axis=-1, keepdims=True)
        var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
        out = (yf - mu) * jax.lax.rsqrt(var + eps)
        return (out * g_ref[...].astype(jnp.float32)
                + b_ref[...].astype(jnp.float32)).astype(dtype)

    def mm(a2, w_ref, b_ref):
        # (R, D) x (D, F) + (1, F) — f32 accumulate on the MXU, cast back
        out = jax.lax.dot_general(
            a2, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (out + b_ref[...].astype(jnp.float32)).astype(dtype)

    h = ln(x, g1_ref, b1_ref)
    q = mm(h, wq_ref, bq_ref).reshape(t, s, d)
    k = mm(h, wk_ref, bk_ref).reshape(t, s, d)
    v = mm(h, wv_ref, bv_ref).reshape(t, s, d)
    heads = []
    for hh in range(n_head):
        sl = slice(hh * hd, (hh + 1) * hd)
        qh = q[:, :, sl].astype(jnp.float32) * scale
        kh = k[:, :, sl].astype(jnp.float32)
        vh = v[:, :, sl].astype(jnp.float32)
        sc = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        heads.append(jax.lax.dot_general(
            w, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ))
    attn = jnp.concatenate(heads, axis=-1).astype(dtype).reshape(t * s, d)
    attn_out = mm(attn, wo_ref, bo_ref)
    seq = (x.astype(jnp.float32) + attn_out.astype(jnp.float32)).astype(dtype)
    h2 = ln(seq, g2_ref, b2_ref)
    fc = mm(h2, wfc_ref, bfc_ref)
    act = (fc.astype(jnp.float32)
           * jax.nn.sigmoid(1.702 * fc.astype(jnp.float32))).astype(dtype)
    proj = mm(act, wp_ref, bp_ref)
    o_ref[...] = (seq.astype(jnp.float32)
                  + proj.astype(jnp.float32)).astype(dtype).reshape(t, s, d)


@functools.partial(
    jax.jit, static_argnames=("n_head", "eps", "tile_g", "interpret")
)
def _block_pallas(x, params, n_head, eps=1e-5, tile_g=16, interpret=False):
    """params: (g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2, wfc, bfc,
    wp, bp) with all weight matrices pre-flattened 2-D."""
    g, s, d = x.shape
    pad = (-g) % tile_g
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    grid = ((g + pad) // tile_g,)
    xspec = pl.BlockSpec((tile_g, s, d), lambda i: (i, 0, 0))
    pspecs = [
        pl.BlockSpec(p.shape, (lambda i: (0,) * p.ndim)) for p in params
    ]
    out = pl.pallas_call(
        functools.partial(_block_kernel, n_head, eps),
        grid=grid,
        in_specs=[xspec] + pspecs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((g + pad, s, d), x.dtype),
        interpret=interpret,
    )(x, *params)
    return out[:g]


def axial_block_fused(
    x: jax.Array,  # (G, S, D)
    params: tuple,  # see _block_pallas
    n_head: int,
    *,
    eps: float = 1e-5,
    interpret: bool = False,
    tile_g: int | None = None,
) -> jax.Array:
    """One whole pre-LN attention+MLP block along S, fully VMEM-resident
    (opt-in via MAGE_SPATIAL_ATTN=fusedblock; see AxialAttentionBlock)."""
    import os

    if tile_g is None:
        tile_g = _pick_tile(x.shape[0],
                            int(os.environ.get("MAGE_BLOCK_TILE", "16")))
    return _block_pallas(x, tuple(params), n_head, eps=eps, tile_g=tile_g,
                         interpret=interpret)


def axial_slot_attention(
    q: jax.Array,  # (G, S, D) — heads merged in D
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    *,
    impl: Literal["pallas", "pallas_interpret", "xla"] = "pallas",
) -> jax.Array:
    """Unmasked multi-head self-attention along S -> (G, S, D)."""
    if impl in ("pallas", "pallas_interpret"):
        interpret = impl == "pallas_interpret"
        if jax.device_count() > 1:
            return _sharded_axial(n_head, interpret)(q, k, v)
        return _axial_pallas(q, k, v, n_head,
                             tile_g=_pick_tile(q.shape[0]),
                             interpret=interpret)
    return _axial_xla(q, k, v, n_head)
