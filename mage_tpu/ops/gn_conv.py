"""Fused GroupNorm -> silu -> 3x3 conv for the KL-AE decoder (inference).

The MAGE+ generation headline is bounded by the KL pixel decoder: 347 ms
of the 419 ms batch-32 generate call, ~178 TFLOP/s effective through its
3x3 convs vs the 331 TFLOP/s matmul peak (BENCH_NOTES.md). Every
``ResnetBlock`` conv site (reference ldm decoder; autoencoder_kl.py:53-69)
is the chain ``GroupNorm -> silu -> conv3x3``: two full-tensor HBM round
trips of pointwise work glued to each conv. This kernel fuses the chain:

- GN statistics stay in XLA (one memory-bound pass, cheap) and collapse to
  per-(batch, channel) affine rows ``a = gamma * rsqrt(var + eps)``,
  ``b = beta - mean * a``;
- a Pallas kernel then computes ``conv3x3(silu(x * a + b))`` directly:
  per (frame, row-tile) block it applies the affine + silu on the tile in
  registers, zeroes the conv padding ring, and accumulates the nine
  shifted (Ht*W, C) x (C, Cout) MXU matmuls in f32 VMEM.

The halo (each row tile needs one neighbor row above/below) is
materialized by an XLA gather into (B, nb, Ht+2, W+2, C) — ~6% redundant
HBM at Ht=32, one extra pass, trivially fused by XLA.

v5e constraints honored (CLAUDE.md): all kernel intermediates >= 2-D
(affine rows ride as (1, C), the pad mask as (Ht+2, W+2) broadcast over a
trailing channel axis), C/Cout in {128, 256, 512} keep the lane dim
aligned, f32 accumulation via ``preferred_element_type``.

Inference-only: no custom_vjp — callers gate on ``train`` (the decode
path inside ``pipeline.generate`` and eval decodes are the targets).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def gn_affine_rows(x, gamma, beta, groups: int, eps: float):
    """Per-(B, C) affine rows (a, b) such that GN(x) == x * a + b.

    Statistics in f32 over (H, W, C//groups) per group — matches flax
    ``nn.GroupNorm(num_groups=groups, epsilon=eps)`` semantics."""
    B, H, W, C = x.shape
    gs = C // groups
    xf = x.astype(jnp.float32).reshape(B, H * W, groups, gs)
    mean = jnp.mean(xf, axis=(1, 3))                      # (B, groups)
    var = jnp.maximum(
        jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean), 0.0
    )
    inv = jax.lax.rsqrt(var + eps)                        # (B, groups)
    mean_c = jnp.repeat(mean, gs, axis=1)                 # (B, C)
    inv_c = jnp.repeat(inv, gs, axis=1)
    a = gamma.astype(jnp.float32)[None, :] * inv_c
    b = beta.astype(jnp.float32)[None, :] - mean_c * a
    return a, b


def _kernel(Ht: int, H: int, W: int, nb: int,
            x_ref, a_ref, b_ref, w_ref, bias_ref, o_ref):
    C = x_ref.shape[-1]
    W2p = x_ref.shape[-2]  # halo width padded to a multiple of 8
    Cout = o_ref.shape[-1]
    i = pl.program_id(0)
    row0 = (i % nb) * Ht - 1  # global row of halo row 0

    x = x_ref[0]                                   # (Ht+2, W2p, C)
    # a/b ride as the FULL (B, C) array (Mosaic rejects (1, C) blocks of a
    # (B, C) array: last-two block dims must be tile-divisible or whole);
    # select this program's batch row with a dynamic ref slice (pl.ds —
    # lax.dynamic_slice has no Mosaic lowering), keeping it 2-D.
    a = a_ref[pl.ds(i // nb, 1), :].reshape(1, 1, C)   # f32
    b = b_ref[pl.ds(i // nb, 1), :].reshape(1, 1, C)
    h = x.astype(jnp.float32) * a + b
    h = h * jax.nn.sigmoid(h)
    rows = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, W2p), 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, (Ht + 2, W2p), 1) - 1
    # f32 multiplicative mask: Mosaic cannot insert a minor dim on an i1
    # vector ("only supported for 32-bit types"), so no bool broadcast
    ring = ((rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)).astype(
        jnp.float32
    )
    h = (h * ring[:, :, None]).astype(x.dtype)

    acc = jnp.zeros((Ht * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = jax.lax.slice(
                h, (dy, dx, 0), (dy + Ht, dx + W, C)
            ).reshape(Ht * W, C)
            acc = acc + jax.lax.dot_general(
                win, w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + bias_ref[...]
    o_ref[0] = acc.reshape(Ht, W, Cout).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "row_tile", "interpret")
)
def gn_silu_conv3x3(x, gamma, beta, kernel, bias, *, groups: int = 32,
                    eps: float = 1e-6, row_tile: int = 32,
                    interpret: bool = False):
    """``conv3x3(silu(GroupNorm(x)), kernel, bias)`` fused.

    x (B, H, W, C); gamma/beta (C,); kernel (3, 3, C, Cout) [flax
    ``nn.Conv`` HWIO layout]; bias (Cout,). Returns (B, H, W, Cout) in
    x.dtype. H must be divisible by min(row_tile, H); W by 8; C and Cout
    by 128 (v5e lane width)."""
    B, H, W, C = x.shape
    Cout = kernel.shape[-1]
    Ht = min(row_tile, H)
    assert H % Ht == 0, (H, Ht)
    # Mosaic requires the last two dims of every block divisible by the
    # (8, 128) tile. The halo block's sublane dim is the padded width: W+2
    # is never divisible by 8 (this was the r3 on-chip crash, VERDICT
    # weak #1), so pad the halo width up to the next multiple of 8 — the
    # kernel's ring mask already zeroes everything at cols >= W, and the
    # nine shifted windows only read cols < W+2, so the extra columns are
    # inert.
    assert W % 8 == 0 and C % 128 == 0 and Cout % 128 == 0, (W, C, Cout)
    W2p = -(-(W + 2) // 8) * 8
    nb = H // Ht

    a, b = gn_affine_rows(x, gamma, beta, groups, eps)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, W2p - W - 1), (0, 0)))
    # halo gather: (B, nb, Ht+2, W2p, C), ~2/Ht redundancy
    xh = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * Ht, i * Ht + Ht + 2, axis=1)
         for i in range(nb)], axis=1,
    ).reshape(B * nb, Ht + 2, W2p, C)

    wk = kernel.reshape(9, C, Cout).astype(x.dtype)
    bias2 = bias.reshape(1, Cout).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, Ht, H, W, nb),
        grid=(B * nb,),
        in_specs=[
            pl.BlockSpec((1, Ht + 2, W2p, C), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((B, C), lambda g: (0, 0)),
            pl.BlockSpec((B, C), lambda g: (0, 0)),
            pl.BlockSpec((9, C, Cout), lambda g: (0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Ht, W, Cout), lambda g: (g, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * nb, Ht, W, Cout), x.dtype),
        interpret=interpret,
    )(xh, a, b, wk, bias2)
    return out.reshape(B, H, W, Cout)


def gn_silu_conv3x3_xla(x, gamma, beta, kernel, bias, *, groups: int = 32,
                        eps: float = 1e-6):
    """Correctness oracle: the unfused XLA chain with identical semantics
    (GN stats in f32, silu, SAME-padded 3x3 conv at x.dtype)."""
    a, b = gn_affine_rows(x, gamma, beta, groups, eps)
    h = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    h = (h * jax.nn.sigmoid(h)).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        h, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).astype(x.dtype)
