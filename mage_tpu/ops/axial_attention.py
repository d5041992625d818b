"""Fused within-slot axial attention (no mask) on a flat (G, S, D) layout.

The sampler's H/W-axis blocks attend over one short axis (S = latent grid
side, 16 at flagship) for G = batch*other_axis independent groups. The
XLA path materializes (..., heads, 32) tensors whose 32-wide minor dim
pads 4x to the TPU's 128-lane tile; this kernel keeps HBM operands flat
(G, S, D) and splits heads only inside VMEM, using Mosaic's batched
``dot_general`` (verified working on v5e) for the (S x S) score and value
matmuls per head.

Opt-in via ``MAGE_SPATIAL_ATTN=pallas`` (see AxialAttentionBlock); the
default XLA einsum measured 3509 f/s end-to-end (BENCH_NOTES.md) and this
kernel exists to probe the remaining ~46 ms spatial-block share of the AR
core.
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


def _pick_tile(g: int, cap: int) -> int:
    for t in range(min(cap, g), 7, -1):
        if g % t == 0 and t % 8 == 0:
            return t
    return 8


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


def axial_slot_attention(
    q: jax.Array,  # (G, S, D) — heads merged in D
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    *,
    impl: Literal["pallas", "pallas_interpret", "xla"] = "pallas",
) -> jax.Array:
    """Unmasked multi-head self-attention along S -> (G, S, D)."""
    if impl == "pallas":
        return _axial_pallas(q, k, v, n_head, tile_g=_pick_tile(q.shape[0], 64))
    if impl == "pallas_interpret":
        return _axial_pallas(q, k, v, n_head, tile_g=_pick_tile(q.shape[0], 64),
                             interpret=True)
    return _axial_xla(q, k, v, n_head)
