"""Stage-2 building blocks: attention, axial blocks, text encoder, 3D-conv
posterior blocks, AdaIN.

Reference components re-designed for TPU (reference: modules/mage_model.py):

- ``AxialAttentionBlock`` (:15-70): attention along exactly one axis of the
  (B, T, H, W, C) token grid, the others folded into batch — the
  reference's permute/view dance becomes a ``moveaxis``+reshape around a
  fused-QKV attention whose batched matmuls tile straight onto the MXU.
- ``CrossAttentionBlock`` (:72-102): the reference switches MAGE/MAGE+
  behavior by commenting code in/out (:92-93); here it's a ``pre_ln`` flag.
- ``TransformerTextEncoder`` (:180-262): token+position embeddings -> LN ->
  dropout -> pad-masked post-LN encoder stack -> LN -> projection.
- ``BasicBlock3D`` (:264-297), ``AdaIN2D`` (:299-314).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9  # additive mask value (float('-inf') breaks softmax grads)


def _spatial_impl(dtype=None) -> str:
    """MAGE_SPATIAL_ATTN: pallas | pallas_interpret | xla — the unmasked
    axial-attention impl for eval-mode spatial blocks
    (ops/axial_attention.py). Default: the fused kernel on TPU for bf16
    activations (measured +6.6% end-to-end generation: 3740 vs 3509 f/s,
    BENCH_NOTES.md); xla elsewhere — f32 stays on the exact einsum so the
    cached sampler's id-exactness proof is precision-for-precision."""
    import os

    env = os.environ.get("MAGE_SPATIAL_ATTN")
    if env:
        if env not in ("pallas", "pallas_interpret", "xla", "fusedblock",
                       "fusedblock_interpret"):
            raise ValueError(
                "MAGE_SPATIAL_ATTN must be pallas|pallas_interpret|xla|"
                f"fusedblock|fusedblock_interpret, got {env!r}"
            )
        return env
    try:
        on_tpu = jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        on_tpu = False
    return "pallas" if (on_tpu and dtype == jnp.bfloat16) else "xla"


def quick_gelu(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (reference mage_model.py:11-13)."""
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """Batched MHA with additive bias and key-padding masking.

    Equivalent surface to torch nn.MultiheadAttention as the reference uses
    it (attn_mask additive float mask: mage_model.py:31-33;
    key_padding_mask: :87-89) — fused per-head einsums for XLA.

    setup-style so the cached autoregressive decode path can reuse the same
    projections incrementally (``project_kv`` + ``attend``).
    """

    d_model: int
    n_head: int
    attn_dropout: float = 0.0
    kernel_init: Callable = nn.initializers.normal(0.02)
    out_init: Optional[Callable] = None

    def setup(self):
        h, hd = self.n_head, self.d_model // self.n_head
        self.q_proj = nn.DenseGeneral((h, hd), axis=-1, kernel_init=self.kernel_init)
        self.k_proj = nn.DenseGeneral((h, hd), axis=-1, kernel_init=self.kernel_init)
        self.v_proj = nn.DenseGeneral((h, hd), axis=-1, kernel_init=self.kernel_init)
        self.out_proj = nn.DenseGeneral(
            self.d_model, axis=(-2, -1), kernel_init=self.out_init or self.kernel_init
        )
        self.weight_dropout = nn.Dropout(self.attn_dropout)

    def project_kv(self, x: jax.Array):
        return self.k_proj(x), self.v_proj(x)

    def attend(
        self,
        qh: jax.Array,
        kh: jax.Array,
        vh: jax.Array,
        bias: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
        train: bool = True,
    ) -> jax.Array:
        hd = self.d_model // self.n_head
        scores = jnp.einsum("...qhd,...khd->...hqk", qh, kh) / jnp.sqrt(
            jnp.asarray(hd, qh.dtype)
        )
        if bias is not None:
            # cast: an f32 bias must not promote bf16 activations
            scores = scores + bias.astype(scores.dtype)  # (Lq, Lk) or broadcastable
        if key_padding_mask is not None:
            # True = masked (torch convention); shape (B, Lk)
            scores = scores + jnp.where(
                key_padding_mask[:, None, None, :], NEG_INF, 0.0
            ).astype(scores.dtype)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.attn_dropout > 0.0:
            weights = self.weight_dropout(weights, deterministic=not train)
        out = jnp.einsum("...hqk,...khd->...qhd", weights, vh)
        return self.out_proj(out)

    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        bias: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,
        train: bool = True,
    ) -> jax.Array:
        return self.attend(
            self.q_proj(q),
            self.k_proj(k),
            self.v_proj(v),
            bias=bias,
            key_padding_mask=key_padding_mask,
            train=train,
        )


class MLP(nn.Module):
    """d -> 4d -> d with QuickGELU (reference mage_model.py:22-26)."""

    d_model: int
    fc_init: Callable = nn.initializers.normal(0.02)
    proj_init: Callable = nn.initializers.normal(0.02)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.d_model * 4, kernel_init=self.fc_init, name="c_fc")(x)
        x = quick_gelu(x)
        return nn.Dense(self.d_model, kernel_init=self.proj_init, name="c_proj")(x)


class AxialAttentionBlock(nn.Module):
    """Pre-LN self-attention + MLP along one axis of (B, T, H, W, C).

    ``axial_dim``: 1 = T, 2 = H, 3 = W (reference mage_model.py:16,29,41-44).
    ``attn_bias``: additive (L, L) mask for the attended axis (the causal
    temporal mask, :380-382). FLOPs estimator parity at :55-70.
    """

    d_model: int
    n_head: int
    dropout: float = 0.1
    axial_dim: int = 1
    attn_init: Callable = nn.initializers.normal(0.02)
    proj_init: Callable = nn.initializers.normal(0.02)
    fc_init: Callable = nn.initializers.normal(0.02)

    def setup(self):
        self.attn = MultiHeadAttention(
            self.d_model, self.n_head,
            kernel_init=self.attn_init, out_init=self.proj_init,
        )
        self.ln_1 = nn.LayerNorm(epsilon=1e-5)
        self.ln_2 = nn.LayerNorm(epsilon=1e-5)
        self.mlp = MLP(self.d_model, fc_init=self.fc_init, proj_init=self.proj_init)
        self.resid_dropout = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jax.Array,
        attn_bias: Optional[jax.Array] = None,
        train: bool = True,
    ) -> jax.Array:
        ndim = x.ndim
        axis = self.axial_dim if self.axial_dim > 0 else self.axial_dim + ndim
        moved = jnp.moveaxis(x, axis, -2)  # (..., L, C)
        shape = moved.shape
        seq = moved.reshape(-1, shape[-2], shape[-1])

        drop = lambda y: self.resid_dropout(y, deterministic=not train)
        impl = _spatial_impl(seq.dtype)
        if (attn_bias is None and not train and impl.startswith("fusedblock")
                and not self.is_initializing()):
            # (during init, fall through so the submodules create their
            # params — _fused_block_params reads .variables["params"],
            # which doesn't exist yet under Module.init)
            # whole-block Pallas kernel: LN1 -> QKV -> attention -> proj ->
            # LN2 -> MLP, fully VMEM-resident (ops/axial_attention.py);
            # eval-mode only (dropout inactive), unmasked axes only
            from mage_tpu.ops.axial_attention import axial_block_fused

            out = axial_block_fused(
                seq, self._fused_block_params(seq.dtype), self.n_head,
                interpret=impl.endswith("interpret"),
            )
            return jnp.moveaxis(out.reshape(shape), -2, axis)
        h = self.ln_1(seq)
        if attn_bias is None and not train and _spatial_impl(h.dtype) != "xla":
            # fused flat-layout attention (default for bf16 on TPU): same
            # projections, heads split in VMEM instead of a padded
            # (..., heads, 32) HBM layout — see ops/axial_attention.py
            from mage_tpu.ops.axial_attention import axial_slot_attention

            g, s = h.shape[0], h.shape[1]
            qh = self.attn.q_proj(h)
            kh, vh = self.attn.project_kv(h)
            o = axial_slot_attention(
                qh.reshape(g, s, -1), kh.reshape(g, s, -1),
                vh.reshape(g, s, -1), self.n_head, impl=_spatial_impl(h.dtype),
            )
            hd = self.d_model // self.n_head
            attn_out = self.attn.out_proj(o.reshape(g, s, self.n_head, hd))
        else:
            attn_out = self.attn(h, h, h, bias=attn_bias, train=train)
        seq = seq + drop(attn_out)
        seq = seq + drop(self.mlp(self.ln_2(seq)))

        return jnp.moveaxis(seq.reshape(shape), -2, axis)

    def _fused_block_params(self, dtype):
        """Flattened 2-D parameter tuple for ops/axial_attention.py::
        axial_block_fused (biases/LN affines as (1, F): 1-D intermediates
        register-spill on v5e Mosaic)."""
        d = self.d_model
        ap = self.attn.variables["params"]
        ln1 = self.ln_1.variables["params"]
        ln2 = self.ln_2.variables["params"]
        mp = self.mlp.variables["params"]

        def w2(kern):
            return jnp.asarray(kern).reshape(d, -1).astype(dtype)

        def wo2(kern):
            return jnp.asarray(kern).reshape(-1, d).astype(dtype)

        def b2(b):
            return jnp.asarray(b).reshape(1, -1).astype(dtype)

        return (
            b2(ln1["scale"]), b2(ln1["bias"]),
            w2(ap["q_proj"]["kernel"]), b2(ap["q_proj"]["bias"]),
            w2(ap["k_proj"]["kernel"]), b2(ap["k_proj"]["bias"]),
            w2(ap["v_proj"]["kernel"]), b2(ap["v_proj"]["bias"]),
            wo2(ap["out_proj"]["kernel"]), b2(ap["out_proj"]["bias"]),
            b2(ln2["scale"]), b2(ln2["bias"]),
            w2(mp["c_fc"]["kernel"]), b2(mp["c_fc"]["bias"]),
            jnp.asarray(mp["c_proj"]["kernel"]).astype(dtype),
            b2(mp["c_proj"]["bias"]),
        )

    def incremental_temporal(
        self,
        x_slot: jax.Array,  # (B, H, W, C) — the single new temporal slot
        cache_k: jax.Array,  # (L, B*H*W, C) — time-major FLAT cache
        cache_v: jax.Array,
        pos: jax.Array,  # scalar index of this slot
    ):
        """Exact single-slot step of a causal temporal layer (axial_dim=1):
        write this slot's K/V at ``pos``, attend the slot's queries over
        cache positions <= pos. Returns (y_slot, cache_k, cache_v).

        Caches are time-major (each step's write is one contiguous
        leading-axis slab) and FLAT in the channel dim: the reference's
        heads = d/32 layout pads (…, heads, 32) tensors 4x on the TPU's
        128-lane tile, so the cache — the step's dominant HBM traffic —
        stays (L, N, D) and heads split only inside the fused attention
        (ops/cached_attention.py: fused XLA einsum by default — measured
        fastest at these shapes — with opt-in Pallas kernels)."""
        from mage_tpu.ops.cached_attention import cached_slot_attention

        b, hgt, wdt, c = x_slot.shape
        n = b * hgt * wdt
        seq = x_slot.reshape(n, 1, c)
        h = self.ln_1(seq)
        qh = self.attn.q_proj(h)  # (N, 1, heads, hd)
        kh, vh = self.attn.project_kv(h)
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, kh.reshape(1, n, c), pos, axis=0
        )
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, vh.reshape(1, n, c), pos, axis=0
        )
        attn2d = cached_slot_attention(
            qh.reshape(n, c), cache_k, cache_v, pos, self.n_head
        )
        hd = c // self.n_head
        attn_out = self.attn.out_proj(attn2d.reshape(n, 1, self.n_head, hd))
        seq = seq + attn_out
        seq = seq + self.mlp(self.ln_2(seq))
        return seq.reshape(b, hgt, wdt, c), cache_k, cache_v

    def incremental_temporal_quant(
        self,
        x_slot: jax.Array,  # (B, H, W, C)
        cache_k: jax.Array,  # (L, B*H*W, C) int8/int4 codes
        cache_v: jax.Array,
        scale_k: jax.Array,  # (L, n_head) f32
        scale_v: jax.Array,
        pos: jax.Array,
    ):
        """``incremental_temporal`` over a quantized KV cache
        (MAGE_KV_QUANT=int8|int4): the new slot's K/V are quantized
        per-head on write and the dequant scales are folded into the
        attention scores/weights (ops/cached_attention.py::
        cached_slot_attention_quant) — int8 halves (int4 quarters) the
        decode step's dominant HBM stream. Returns
        (y_slot, cache_k, cache_v, scale_k, scale_v)."""
        from mage_tpu.ops.cached_attention import (
            cached_slot_attention_quant,
            quantize_kv_slot,
        )

        b, hgt, wdt, c = x_slot.shape
        n = b * hgt * wdt
        bits = 8 if cache_k.dtype == jnp.int8 else 4
        seq = x_slot.reshape(n, 1, c)
        h = self.ln_1(seq)
        qh = self.attn.q_proj(h)
        kh, vh = self.attn.project_kv(h)
        kq, ks = quantize_kv_slot(kh.reshape(n, c), self.n_head, bits)
        vq, vs = quantize_kv_slot(vh.reshape(n, c), self.n_head, bits)
        cache_k = jax.lax.dynamic_update_slice_in_dim(
            cache_k, kq.reshape(1, n, c), pos, axis=0
        )
        cache_v = jax.lax.dynamic_update_slice_in_dim(
            cache_v, vq.reshape(1, n, c), pos, axis=0
        )
        scale_k = jax.lax.dynamic_update_slice_in_dim(scale_k, ks, pos, axis=0)
        scale_v = jax.lax.dynamic_update_slice_in_dim(scale_v, vs, pos, axis=0)
        attn2d = cached_slot_attention_quant(
            qh.reshape(n, c), cache_k, cache_v, scale_k, scale_v, pos,
            self.n_head,
        )
        hd = c // self.n_head
        attn_out = self.attn.out_proj(attn2d.reshape(n, 1, self.n_head, hd))
        seq = seq + attn_out
        seq = seq + self.mlp(self.ln_2(seq))
        return seq.reshape(b, hgt, wdt, c), cache_k, cache_v, scale_k, scale_v

    def single_slot_spatial(self, x_slot: jax.Array, train: bool = False):
        """Run this H- or W-axis block on one temporal slot (B, H, W, C)."""
        return self(x_slot[:, None], attn_bias=None, train=train)[:, 0]

    def flops(self, token_num: int, axis_len: int) -> int:
        d = self.d_model
        return (
            3 * token_num * d * d
            + token_num * axis_len * d * 2
            + 2 * token_num * d * d * 4
            + token_num * d * 2
        )


class CrossAttentionBlock(nn.Module):
    """q x (k, v) cross-attention + MLP (reference TransformerBlock,
    mage_model.py:72-102). ``pre_ln=False`` reproduces MAGE (no LN on q/kv,
    :92); ``pre_ln=True`` reproduces MAGE+ (:93)."""

    d_model: int
    n_head: int
    dropout: float = 0.1
    pre_ln: bool = False

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        key_padding_mask: Optional[jax.Array] = None,
        train: bool = True,
    ) -> jax.Array:
        attn = MultiHeadAttention(self.d_model, self.n_head, name="attn")
        drop = nn.Dropout(self.dropout, deterministic=not train)
        if self.pre_ln:
            ln_q = nn.LayerNorm(epsilon=1e-5, name="ln_q")
            ln_kv = nn.LayerNorm(epsilon=1e-5, name="ln_kv")
            x = q + drop(
                attn(ln_q(q), ln_kv(k), ln_kv(v), key_padding_mask=key_padding_mask, train=train)
            )
        else:
            x = q + drop(attn(q, k, v, train=train))
        x = x + drop(MLP(self.d_model, name="mlp")(nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)))
        return x


class MAEncoder(nn.Module):
    """Motion-Anchor encoder: ``layers`` CrossAttentionBlocks; queries =
    first-frame tokens, kv = text embeddings (reference mage_model.py:104-123)."""

    layers: int
    d_model: int
    dropout: float = 0.1
    pre_ln: bool = False

    @nn.compact
    def __call__(self, x, kv, key_padding_mask=None, train: bool = True):
        for i in range(self.layers):
            x = CrossAttentionBlock(
                self.d_model,
                self.d_model // 32,
                self.dropout,
                pre_ln=self.pre_ln,
                name=f"block_{i}",
            )(x, kv, kv, key_padding_mask=key_padding_mask, train=train)
        return x


class _TorchStyleEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer matching torch's
    nn.TransformerEncoderLayer (used at reference mage_model.py:192-200):
    gelu MLP, dropout on attention weights and both residuals."""

    width: int
    n_head: int
    dropout: float

    @nn.compact
    def __call__(self, x, key_padding_mask=None, train: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=not train)
        h = MultiHeadAttention(
            self.width, self.n_head, attn_dropout=self.dropout, name="self_attn"
        )(x, x, x, key_padding_mask=key_padding_mask, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(h))
        h = nn.Dense(self.width * 4, kernel_init=nn.initializers.normal(0.02), name="linear1")(x)
        h = drop(jax.nn.gelu(h, approximate=False))
        h = nn.Dense(self.width, kernel_init=nn.initializers.normal(0.02), name="linear2")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(h))


class TransformerTextEncoder(nn.Module):
    """Reference mage_model.py:180-262. Token+position embeddings -> LN ->
    dropout -> zero pad positions -> post-LN encoder stack with key-padding
    mask -> final LN -> linear projection."""

    vocab_size: int
    transformer_width: int
    transformer_layers: int
    output_dim: int
    context_length: int
    padding_idx: int = 0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, text: jax.Array, train: bool = True) -> jax.Array:
        emb_init = nn.initializers.normal(0.02)
        tok = nn.Embed(
            self.vocab_size, self.transformer_width, embedding_init=emb_init,
            name="token_embedding",
        )(text)
        positions = jnp.arange(text.shape[-1])[None, :]
        pos = nn.Embed(
            self.context_length, self.transformer_width, embedding_init=emb_init,
            name="positions",
        )(positions)
        x = nn.LayerNorm(epsilon=1e-8, name="layer_norm")(tok + pos)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        token_mask = text != self.padding_idx
        x = x * token_mask[..., None].astype(x.dtype)
        # positions at/after the caption length are masked in attention
        # (reference :236-237: length < cumsum(ones))
        text_length = jnp.sum(token_mask, axis=-1, keepdims=True)
        caption_mask = text_length < jnp.cumsum(jnp.ones_like(text), axis=-1)

        for i in range(self.transformer_layers):
            x = _TorchStyleEncoderLayer(
                self.transformer_width,
                self.transformer_width // 32,
                self.dropout,
                name=f"layer_{i}",
            )(x, key_padding_mask=caption_mask, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_text_final")(x)
        return nn.Dense(
            self.output_dim, kernel_init=emb_init, name="text_projection"
        )(x)


class BasicBlock3D(nn.Module):
    """3D-conv residual block with GroupNorm(16) and temporal stride
    (reference mage_model.py:264-297). Input (B, T, H, W, C).

    ``spectral`` wraps conv1/conv2 in spectral normalization (the
    reference's optional flag, :277-279; never enabled by shipped configs).
    Semantics match ``torch.nn.utils.spectral_norm``: each TRAINING call
    runs one persistent power-iteration step on the stored ``u`` vector
    and divides the kernel by the estimated top singular value
    (tests/test_mage_layers.py pins sigma against the torch implementation).
    Training callers must apply with ``train=True`` AND
    ``mutable=['batch_stats']`` — flax raises loudly if the power-iteration
    write is attempted on an immutable collection, so a silently-frozen
    estimate is impossible; ``train=False`` reuses the stored ``u``
    without updating (torch eval behavior)."""

    out_planes: int
    stride: int = 1
    stride_t: int = 1
    downsample: bool = False
    spectral: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        strides = (self.stride_t, self.stride, self.stride)
        if self.spectral:
            update = train and not self.is_initializing()
            wrap = lambda m: (
                lambda y: nn.SpectralNorm(m, error_on_non_matrix=False)(
                    y, update_stats=update
                )
            )
        else:
            wrap = lambda m: m
        residual = x
        h = wrap(nn.Conv(
            self.out_planes, (3, 3, 3), strides=strides, padding=1, use_bias=False,
            kernel_init=kaiming, name="conv1",
        ))(x)
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="bn1")(h)
        h = nn.relu(h)
        h = wrap(nn.Conv(
            self.out_planes, (3, 3, 3), padding=1, use_bias=False,
            kernel_init=kaiming, name="conv2",
        ))(h)
        h = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="bn2")(h)
        if self.downsample:
            residual = nn.Conv(
                self.out_planes, (3, 3, 3), strides=strides, padding=1,
                use_bias=False, kernel_init=kaiming, name="downsample_conv",
            )(x)
            residual = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="downsample_norm")(residual)
        return nn.relu(h + residual)


class AdaIN2D(nn.Module):
    """Instance-norm (over H, W, no affine) modulated by conv-predicted
    per-pixel gamma/beta from a conditioning map
    (reference ADAIN2D, mage_model.py:299-314). Inputs NHWC."""

    num_features: int

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        gamma = nn.Conv(self.num_features, (3, 3), padding=1, name="conv_mu_0")(y)
        gamma = nn.Conv(self.num_features, (3, 3), padding=1, name="conv_mu_1")(gamma)
        beta = nn.Conv(self.num_features, (3, 3), padding=1, name="conv_var_0")(y)
        beta = nn.Conv(self.num_features, (3, 3), padding=1, name="conv_var_1")(beta)
        return gamma * out + beta
