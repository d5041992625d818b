"""MAGE stage-2: causal axial spatio-temporal video transformer.

Re-design of the reference's ``FlatAxialDecoder`` + ``MAGE``
(reference: modules/mage_model.py:317-390, 446-693) as pure flax modules
over explicit latents:

- The frozen first stage is *not* inside this module. The reference embeds
  it and freezes with requires_grad=False + a train() monkeypatch
  (:440-443,516-521); here ``MAGECore`` consumes stage-1 latents and the
  composition lives in :mod:`mage_tpu.models.pipeline` — trainable state is
  exactly ``MAGECore``'s params, nothing to freeze.
- The stochastic branch returns (kl, mu, logvar) and the *final* loss
  assembly (fixed beta/alpha vs PID auto-beta, :624-636) happens in the
  train step where the host-side PID controller lives.
- ``generate`` runs the reference's buffer-overwrite autoregressive loop
  (:670-684) as a single fused ``lax.fori_loop`` under jit instead of L-1
  separate host-dispatched decoder passes.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mage_tpu.models.layers import (
    NEG_INF,
    AdaIN2D,
    AxialAttentionBlock,
    BasicBlock3D,
    MAEncoder,
    TransformerTextEncoder,
)


def causal_temporal_bias(length: int, dtype=jnp.float32) -> jax.Array:
    """Additive lower-triangular mask (reference build_casual_attention_mask,
    mage_model.py:367-372)."""
    return jnp.triu(jnp.full((length, length), NEG_INF, dtype), k=1)


class CausalizableGroupNorm(nn.Module):
    """GroupNorm over all non-batch dims (torch ``nn.GroupNorm`` semantics,
    the reference continuous head's norm, mage_model.py:350-354), with an
    extra entry point that normalizes using externally supplied statistics.

    Same parameter tree as ``nn.GroupNorm`` ({scale, bias}), so torch
    checkpoint import is unchanged. The external-stats path powers the O(L)
    cached sampler: statistics are accumulated *causally* over the slots
    generated so far instead of over the full buffer (see
    ``MAGECore.generate_cached`` for the analysis)."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mean=None, var=None):
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(x.shape[0], -1, g, c // g)
        if mean is None:
            mean = jnp.mean(xg, axis=(1, 3))  # (B, groups)
            var = jnp.var(xg, axis=(1, 3))
        xn = (xg - mean[:, None, :, None]) * jax.lax.rsqrt(
            var[:, None, :, None] + self.epsilon
        )
        return xn.reshape(x.shape) * scale + bias


def group_moments(x: jax.Array, num_groups: int):
    """Per-(batch, group) element count / sum / sum-of-squares of one slot
    (B, h, w, C) — the accumulable sufficient statistics for GroupNorm.
    Accumulated in f32 regardless of activation dtype: the E[x^2]-E[x]^2
    form cancels catastrophically in bf16 (an 8-bit mantissa can make the
    variance negative -> rsqrt NaN at sampling time)."""
    b, c = x.shape[0], x.shape[-1]
    xg = x.reshape(b, -1, num_groups, c // num_groups).astype(jnp.float32)
    n = xg.shape[1] * xg.shape[3]
    return n, jnp.sum(xg, axis=(1, 3)), jnp.sum(xg**2, axis=(1, 3))


class FlatAxialDecoder(nn.Module):
    """Axial spatio-temporal generator (reference mage_model.py:317-390).

    ``layers`` AxialAttentionBlocks cycle axes T, H, W (``i % 3``); every
    T-layer applies the causal temporal mask. The motion anchor is
    prepended as pseudo-frame 0; outputs predict frames 1..L-1.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    frames_length: int
    layers: int
    context_channels: Optional[int] = None
    use_cids: bool = True
    dropout: float = 0.1
    remat: bool = False  # rematerialize each axial block's activations

    def setup(self):
        mc = self.model_channels
        self.in_linear = nn.Dense(mc)
        self.context_linear = nn.Dense(mc)
        self.T_positional_embedding = self.param(
            "T_positional_embedding",
            lambda rng: mc**-0.5
            * jax.random.normal(rng, (self.frames_length, 1, 1, mc)),
        )
        # CLIP-style scaled init (reference initialize_parameters, :357-365)
        proj_std = (mc**-0.5) * ((2 * self.layers) ** -0.5)
        attn_std = mc**-0.5
        fc_std = (2 * mc) ** -0.5
        self.blocks = [
            AxialAttentionBlock(
                mc,
                mc // 32,
                dropout=self.dropout,
                axial_dim=i % 3 + 1,
                attn_init=nn.initializers.normal(attn_std),
                proj_init=nn.initializers.normal(proj_std),
                fc_init=nn.initializers.normal(fc_std),
            )
            for i in range(self.layers)
        ]
        if self.use_cids:
            self.out = nn.Dense(self.out_channels)
        else:
            self.out_norm = CausalizableGroupNorm(num_groups=32, epsilon=1e-5)
            # zero-init 1x1x1 conv3d head (reference zero_module, :350-354)
            self.out_conv = nn.Dense(
                self.out_channels, kernel_init=nn.initializers.zeros
            )

    def head(self, x: jax.Array) -> jax.Array:
        if self.use_cids:
            return self.out(x)
        h = self.out_norm(x)
        return self.out_conv(nn.silu(h))

    def __call__(self, motion: jax.Array, imgs: jax.Array, train: bool = True):
        """motion (B, h, w, Cctx); imgs (B, L-1, h, w, Cin) ->
        (B, L-1, h, w, out_channels) logits/latents."""
        imgs = self.in_linear(imgs)
        motion = self.context_linear(motion)
        x = jnp.concatenate([motion[:, None], imgs], axis=1)
        x = x + self.T_positional_embedding

        bias = causal_temporal_bias(self.frames_length, x.dtype)
        if self.remat and train:
            # jax.checkpoint per block: recompute activations in backward
            # instead of storing the (B, L, h, w, C) residual stream 4x per
            # block — trades ~1.3x attention FLOPs for O(layers) activation
            # memory, the standard TPU recipe for scaling batch/sequence.
            run = nn.remat(lambda blk, y, b: blk(y, attn_bias=b, train=True))
            for i, block in enumerate(self.blocks):
                x = run(block, x, bias if i % 3 == 0 else None)
        else:
            for i, block in enumerate(self.blocks):
                x = block(x, attn_bias=bias if i % 3 == 0 else None, train=train)

        return self.head(x[:, 1:])  # drop the anchor pseudo-frame

    # ---- cached incremental decode (exact under temporal causality) ------

    def init_cache(self, batch: int, h: int, w: int, dtype=jnp.float32):
        """Empty per-temporal-layer KV caches (time-major FLAT layout: see
        AxialAttentionBlock.incremental_temporal): the GroupNorm in the head
        and H/W layers are per-slot, so only T-layers (i % 3 == 0) need
        state.

        MAGE_KV_QUANT=int8|int4 (opt-in, default off = reference-exact
        numerics) stores the caches as quantized codes + per-(slot, head)
        f32 scales — entries become 4-tuples (k, v, scale_k, scale_v) and
        decode_slot routes through incremental_temporal_quant. int8 halves
        (int4 quarters) the decode step's dominant HBM stream (the
        full-cache read per temporal layer, BENCH_NOTES.md)."""
        import os

        quant = os.environ.get("MAGE_KV_QUANT", "")
        if quant not in ("", "none", "int8", "int4"):
            raise ValueError(
                f"MAGE_KV_QUANT must be int8|int4|none, got {quant!r}"
            )
        shape = (self.frames_length, batch * h * w, self.model_channels)
        if quant in ("int8", "int4"):
            qdtype = jnp.int8 if quant == "int8" else jnp.int4
            sshape = (self.frames_length, self.model_channels // 32)
            return {
                f"layer_{i}": (
                    jnp.zeros(shape, qdtype),
                    jnp.zeros(shape, qdtype),
                    jnp.zeros(sshape, jnp.float32),
                    jnp.zeros(sshape, jnp.float32),
                )
                for i in range(self.layers)
                if i % 3 == 0
            }
        return {
            f"layer_{i}": (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for i in range(self.layers)
            if i % 3 == 0
        }

    def decode_slot(self, slot: jax.Array, pos, cache: dict, is_anchor: bool = False):
        """Process ONE temporal slot (B, h, w, C_in/C_ctx) through all
        layers, reading/extending the temporal KV caches at ``pos``.
        Returns (trunk output (B, h, w, model_channels), new cache) — the
        head is applied by the caller (``head_slot`` / ``head_causal``),
        because for the continuous head its GroupNorm statistics are
        accumulated across slots."""
        x = self.context_linear(slot) if is_anchor else self.in_linear(slot)
        x = x + jax.lax.dynamic_index_in_dim(
            self.T_positional_embedding, pos, axis=0, keepdims=False
        )
        new_cache = dict(cache)
        for i, block in enumerate(self.blocks):
            if i % 3 == 0:
                entry = new_cache[f"layer_{i}"]
                if len(entry) == 4:  # quantized cache (MAGE_KV_QUANT)
                    x, *entry = block.incremental_temporal_quant(
                        x, *entry, pos
                    )
                    new_cache[f"layer_{i}"] = tuple(entry)
                else:
                    k, v = entry
                    x, k, v = block.incremental_temporal(x, k, v, pos)
                    new_cache[f"layer_{i}"] = (k, v)
            else:
                x = block.single_slot_spatial(x, train=False)
        return x, new_cache

    def head_slot(self, x: jax.Array) -> jax.Array:
        """Discrete head on one trunk slot (B, h, w, mc) -> logits."""
        assert self.use_cids
        return self.out(x)

    def init_gn_state(self, batch: int, dtype=jnp.float32):
        """Zero accumulators (count, sum, sumsq) per (batch, group) for the
        causal GroupNorm statistics of the continuous head. Accumulators
        are f32 regardless of activation dtype (``dtype`` is accepted for
        API stability but ignored): see group_moments."""
        del dtype
        g = 32
        return (
            jnp.zeros((), jnp.int32),
            jnp.zeros((batch, g), jnp.float32),
            jnp.zeros((batch, g), jnp.float32),
        )

    def head_causal(self, x: jax.Array, gn_state):
        """Continuous head on one trunk slot with GroupNorm statistics over
        all *valid* slots generated so far (this one included). Returns
        (latents (B, h, w, out_channels), new gn_state). Moments reduce in
        f32 (E[x^2]-E[x]^2 cancels catastrophically in bf16 — negative
        variance -> NaN); the normalization itself runs in x.dtype."""
        assert not self.use_cids
        count, s, ss = gn_state
        n, s1, ss1 = group_moments(x, 32)
        count = count + n
        s = s + s1
        ss = ss + ss1
        denom = count.astype(jnp.float32)
        mean = s / denom
        var = jnp.maximum(ss / denom - mean**2, 0.0)
        h = self.out_norm(x, mean=mean.astype(x.dtype), var=var.astype(x.dtype))
        return self.out_conv(nn.silu(h)), (count, s, ss)


class MAGECore(nn.Module):
    """All trainable stage-2 state (reference MAGE minus the frozen first
    stage, mage_model.py:446-639)."""

    codebook_size: int
    frames_length: int
    image_resolution: int
    vision_width: int
    embed_dim: int = 4  # first-stage latent channels when use_cids=False
    dropout: float = 0.1
    use_cids: bool = False
    randomness: bool = False
    pre_ln: bool = False  # MAGE+ cross-attention variant (:92-93)
    remat: bool = False  # rematerialize axial blocks + the 3D-conv pyramid
    # Opt-in (0 = reference-exact uniform loss, mage_model.py:618-620).
    # Motion-weighted reconstruction: each target token's loss is scaled by
    # 1 + motion_loss_weight * moved(token), normalized to mean 1 (so loss
    # scale / LR / beta semantics are unchanged). ``moved`` = the token's
    # latent changed from the previous frame (id inequality for discrete,
    # normalized squared temporal diff for continuous). Counters the
    # copy-frame equilibrium on mostly-static data: on stop-at-wall
    # Modified-Double MNIST per-frame CE collapses to ~1e-8 after the
    # digits stop, so the caption-direction signal is a sliver of the
    # uniform loss (measured, ROUND_STATUS.md r3 item 3).
    motion_loss_weight: float = 0.0
    # Opt-in (0 = reference-exact). Early-frame upweighting: the first
    # ``early_loss_frames`` PREDICTED frames get weight scaled by
    # (1 + early_loss_weight), normalized to mean 1. Targets initial-
    # direction sign binding: the caption's sign bit only constrains the
    # first few predictions (after that, position + physics determine the
    # continuation), so under a uniform loss it is a sliver of the total —
    # measured 65-73% sign-given-axis after 201 epochs on Single Moving
    # MNIST vs a 100% ceiling (docs/results/direction_binding_single.md).
    early_loss_weight: float = 0.0
    early_loss_frames: int = 3
    # text encoder
    text_vocab_size: int = 30
    text_context_length: int = 32
    text_width: int = 512
    text_layers: int = 2
    text_output_dim: int = 512
    text_padding_idx: int = 0
    text_dropout: float = 0.1
    # motion-anchor encoder
    ma_layers: int = 1
    ma_d_model: int = 512
    # generator
    dec_layers: int = 6
    dec_out_channels: int = 512
    # config-driven class overrides (reference instantiates every
    # sub-component from its config ``target``, mage_model.py:474-477).
    # When a *_cls is set, it is constructed with the matching *_params dict
    # (plus the same runtime injections the reference merges in) instead of
    # the built-in default class.
    text_encoder_cls: Optional[type] = None
    text_encoder_params: Optional[Mapping[str, Any]] = None
    ma_cls: Optional[type] = None
    ma_params: Optional[Mapping[str, Any]] = None
    decoder_cls: Optional[type] = None
    decoder_params: Optional[Mapping[str, Any]] = None

    def setup(self):
        w = self.vision_width
        if self.use_cids:
            self.visual_token_embedding = nn.Embed(
                self.codebook_size, w,
                embedding_init=nn.initializers.normal(0.02),
            )
        else:
            self.visual_token_projection = nn.Dense(
                w, kernel_init=nn.initializers.normal(0.02)
            )
        self.conv = nn.Conv(w, (3, 3), padding=1, use_bias=False)
        scale = w**-0.5
        self.speed_embedding = self.param(
            "speed_embedding", lambda rng: scale * jax.random.normal(rng, (1, w))
        )
        r = self.image_resolution
        self.H_positional_embedding = self.param(
            "H_positional_embedding",
            lambda rng: scale * jax.random.normal(rng, (r, 1, w)),
        )
        self.W_positional_embedding = self.param(
            "W_positional_embedding",
            lambda rng: scale * jax.random.normal(rng, (1, r, w)),
        )
        if self.text_encoder_cls is not None:
            self.text_encoder = self.text_encoder_cls(
                **dict(self.text_encoder_params or {})
            )
        else:
            self.text_encoder = TransformerTextEncoder(
                vocab_size=self.text_vocab_size,
                transformer_width=self.text_width,
                transformer_layers=self.text_layers,
                output_dim=self.text_output_dim,
                context_length=self.text_context_length,
                padding_idx=self.text_padding_idx,
                dropout=self.text_dropout,
            )
        if self.ma_cls is not None:
            # runtime injection parity: reference merges {'dropout'} into
            # the MA config (mage_model.py:475)
            self.ma_encoder = self.ma_cls(
                **{"dropout": self.dropout, **dict(self.ma_params or {})}
            )
        else:
            self.ma_encoder = MAEncoder(
                layers=self.ma_layers,
                d_model=self.ma_d_model,
                dropout=self.dropout,
                pre_ln=self.pre_ln,
            )
        if self.decoder_cls is not None:
            # reference merges {'use_cids', 'dropout', 'context_channels'}
            # into the decoder config (mage_model.py:476-477)
            self.generate_model = self.decoder_cls(
                **{
                    "use_cids": self.use_cids,
                    "dropout": self.dropout,
                    "context_channels": self.ma_d_model,
                    **dict(self.decoder_params or {}),
                }
            )
        else:
            self.generate_model = FlatAxialDecoder(
                in_channels=w,
                model_channels=self.ma_d_model,
                out_channels=self.dec_out_channels,
                frames_length=self.frames_length,
                layers=self.dec_layers,
                context_channels=self.ma_d_model,
                use_cids=self.use_cids,
                dropout=self.dropout,
                remat=self.remat,
            )
        if self.randomness:
            self.conv3d = [
                BasicBlock3D(w, stride=1, stride_t=2, downsample=True),
                BasicBlock3D(w, stride=1, stride_t=2, downsample=True),
                BasicBlock3D(w, stride=1, stride_t=2, downsample=True),
                BasicBlock3D(self.ma_d_model, stride=1, stride_t=2, downsample=True),
            ]
            self.conv_mu2 = nn.Conv(64, (3, 3), padding=1)
            self.conv_var2 = nn.Conv(64, (3, 3), padding=1)
            self.conv_d2 = nn.Conv(w, (3, 3), padding=1, use_bias=False)
            self.adain = AdaIN2D(w)

    # ---- pieces -----------------------------------------------------------

    def embed_latents(self, x: jax.Array) -> jax.Array:
        """ids (B, L, h, w) or continuous (B, L, h, w, c) ->
        (B, L, h, w, width) (reference :580-583)."""
        if self.use_cids:
            return self.visual_token_embedding(x.astype(jnp.int32))
        return self.visual_token_projection(x)

    def stem(self, x_emb: jax.Array) -> jax.Array:
        """Per-frame 3x3 conv + separable H/W positional embeddings
        (reference :586-588). (B, L', h, w, C) -> same."""
        b, l, h, w, c = x_emb.shape
        out = self.conv(x_emb.reshape(b * l, h, w, c)).reshape(b, l, h, w, c)
        return out + self.H_positional_embedding + self.W_positional_embedding

    def _early_frame_weight(self, n_frames: int) -> jax.Array:
        """(1, n_frames, 1, 1) per-frame loss multiplier: the first
        ``early_loss_frames`` predicted frames get 1 + early_loss_weight
        (1.0 everywhere when the knob is off)."""
        t = jnp.arange(n_frames)
        wf = jnp.where(
            t < self.early_loss_frames, 1.0 + self.early_loss_weight, 1.0
        )
        return wf[None, :, None, None].astype(jnp.float32)

    def compute_motion_anchor(
        self,
        first_tokens: jax.Array,  # (B, h*w, C)
        text_emb: jax.Array,
        video_emb: Optional[jax.Array],  # (B, h, w, 64) sample, if randomness
        speed: Optional[jax.Array],
        train: bool = True,
    ) -> jax.Array:
        b = first_tokens.shape[0]
        r = self.image_resolution
        anchor = self.ma_encoder(first_tokens, text_emb, train=train)
        anchor = anchor.reshape(b, r, r, -1)
        if self.randomness:
            assert video_emb is not None
            cond = self.conv_d2(video_emb)
            anchor = self.adain(anchor, cond)
        if speed is not None:
            speed_emb = speed.reshape(b, 1) @ self.speed_embedding  # (B, C)
            anchor = anchor + speed_emb[:, None, None, :]
        return anchor

    def video_posterior(self, x_emb: jax.Array, train: bool = False):
        """3D-conv pyramid over the full embedded video -> (mu, logvar)
        (reference :600-603). (B, L, h, w, C) -> two (B, h, w, 64).

        ``train`` reaches the BasicBlock3D spectral-norm power iteration
        (it only updates its persistent ``u`` on training calls).

        Under ``remat`` each BasicBlock3D is checkpointed: the pyramid's
        3x3x3x512ch activations over the full video dominate training
        memory (its FLOPs dominate the whole step — see BENCH_NOTES.md)."""
        h = x_emb
        if self.remat:
            run = nn.remat(lambda blk, y: blk(y, train))
            for block in self.conv3d:
                h = run(block, h)
        else:
            for block in self.conv3d:
                h = block(h, train=train)
        # The pyramid's fixed stride-2 stack collapses T=frames_length to 1
        # at the reference's 16 frames; longer clips (BENCH_FRAMES=64 KV-
        # quant study) leave a residual T axis, pooled here — identical to
        # the reference's squeeze for T==1, mean-pool otherwise.
        h = h.mean(axis=1) if h.shape[1] > 1 else h.squeeze(1)
        return self.conv_mu2(h), self.conv_var2(h)

    def speed_l2(self, speed: jax.Array) -> jax.Array:
        """alpha-regularizer: mean ||speed_emb||^2 (reference :633)."""
        emb = (speed.reshape(-1, 1) @ self.speed_embedding).astype(jnp.float32)
        return jnp.mean(jnp.sum(emb**2, axis=-1))

    # ---- training forward -------------------------------------------------

    def __call__(
        self,
        latents: jax.Array,
        text: jax.Array,
        speed: Optional[jax.Array] = None,
        train: bool = True,
        test_flag: bool = False,
        context_latents: Optional[jax.Array] = None,
    ) -> dict:
        """Teacher-forced forward (reference :575-639). Returns raw loss
        terms; beta/alpha weighting happens in the train step.

        ``context_latents`` (optional) decouples the conditioning stream
        from the loss targets: the decoder context (stem input) comes from
        ``context_latents`` while labels/targets, the video posterior, and
        the motion-loss weights still use the ground-truth ``latents``.
        Scheduled-sampling-style training against AR drift: passing a
        frame-0-repeated context teaches the model to produce the caption's
        motion even when the conditioning stream is static — exactly the
        degenerate context the AR rollout collapses into (measured in
        scripts/diag_magep_semantic.py: teacher-forced motion energy 0.60
        vs rollout 0.005 on the same checkpoint). None = reference-exact
        teacher forcing (mage_model.py:586-588)."""
        x_emb = self.embed_latents(latents)
        b = x_emb.shape[0]
        ctx_emb = (
            x_emb if context_latents is None
            else self.embed_latents(context_latents)
        )
        prior_img = self.stem(ctx_emb[:, : self.frames_length - 1])
        first_tokens = prior_img[:, 0].reshape(b, -1, x_emb.shape[-1])
        text_emb = self.text_encoder(text, train=train)

        video_emb = None
        mu = logvar = None
        if self.randomness:
            mu, logvar = self.video_posterior(x_emb, train=train)
            eps = jax.random.normal(self.make_rng("latent"), logvar.shape, logvar.dtype)
            video_emb = mu + eps * jnp.exp(0.5 * logvar)
            if test_flag:  # prior sampling at test (reference :604-605)
                video_emb = jax.random.normal(
                    self.make_rng("latent"), logvar.shape, logvar.dtype
                )

        anchor = self.compute_motion_anchor(
            first_tokens, text_emb, video_emb, speed, train=train
        )
        predict = self.generate_model(anchor, prior_img, train=train)

        # loss reductions always run in f32 so bf16 compute (mixed
        # precision training) keeps full-precision loss/gradient signals
        if self.use_cids:
            labels = latents[:, 1 : self.frames_length].astype(jnp.int32)
            logits = predict.reshape(-1, self.codebook_size).astype(jnp.float32)
            tok_ce = -jax.nn.log_softmax(logits)[
                jnp.arange(logits.shape[0]), labels.reshape(-1)
            ]
            if self.motion_loss_weight > 0 or self.early_loss_weight > 0:
                w = jnp.ones(labels.shape, jnp.float32)  # (B, T-1, h, w)
                if self.motion_loss_weight > 0:
                    prev = latents[:, : self.frames_length - 1].astype(jnp.int32)
                    moved = (labels != prev).astype(jnp.float32)
                    w = w * (1.0 + self.motion_loss_weight * moved)
                w = w * self._early_frame_weight(labels.shape[1])
                w = (w / jnp.mean(w)).reshape(-1)
                recon = jnp.mean(tok_ce * w)
            else:
                recon = jnp.mean(tok_ce)
        else:
            target = latents[:, 1 : self.frames_length].astype(jnp.float32)
            diff = predict.astype(jnp.float32) - target
            if self.motion_loss_weight > 0 or self.early_loss_weight > 0:
                w = jnp.ones(target.shape[:-1], jnp.float32)
                if self.motion_loss_weight > 0:
                    prev = latents[:, : self.frames_length - 1].astype(jnp.float32)
                    # per-token motion energy; for sampled KL latents the
                    # posterior noise adds a uniform floor, which only softens
                    # the contrast (weights stay correctly ordered)
                    d2 = jnp.mean((target - prev) ** 2, axis=-1)
                    w = w * (
                        1.0 + self.motion_loss_weight * d2 / (jnp.mean(d2) + 1e-8)
                    )
                w = w * self._early_frame_weight(target.shape[1])
                w = w / jnp.mean(w)
                recon = jnp.mean(jnp.mean(diff**2, axis=-1) * w)
            else:
                recon = jnp.mean(diff**2)

        out = {"prediction": recon, "predict": predict}
        if self.randomness:
            mu_f = mu.reshape(b, -1).astype(jnp.float32)
            logvar_f = logvar.reshape(b, -1).astype(jnp.float32)
            out["kl_loss"] = -0.5 * jnp.mean(
                jnp.sum(1 + logvar_f - mu_f**2 - jnp.exp(logvar_f), axis=1)
            )
        if speed is not None:
            out["speed_l2"] = self.speed_l2(speed)
        return out

    # ---- autoregressive generation ---------------------------------------

    def _prepare_generation(self, latents0, text, speed, video_noise):
        x_emb0 = self.embed_latents(latents0)  # (B, 1, h, w, C)
        b, _, h, w, c = x_emb0.shape
        first_tokens = self.stem(x_emb0)[:, 0].reshape(b, -1, c)
        text_emb = self.text_encoder(text, train=False)
        video_emb = None
        if self.randomness:
            video_emb = (
                video_noise
                if video_noise is not None
                else jax.random.normal(
                    self.make_rng("latent"), (b, h, w, 64), x_emb0.dtype
                )
            )
        anchor = self.compute_motion_anchor(
            first_tokens, text_emb, video_emb, speed, train=False
        )
        return x_emb0, anchor

    def generate(
        self,
        latents0: jax.Array,
        text: jax.Array,
        speed: Optional[jax.Array] = None,
        video_noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Greedy frame-by-frame generation from the first frame's latents
        (reference autoregressive_generate, :641-693). ``latents0``:
        (B, 1, h, w[, c]). Returns generated latents for frames 1..L-1:
        ids (B, L-1, h, w) or continuous (B, L-1, h, w, c).

        Semantics parity: the input buffer is pre-filled with the
        first-frame embedding and slot i+1 is overwritten with the
        embedding of frame i's prediction each step; the causal mask hides
        the stale future slots (:670-684).
        """
        x_emb0, anchor = self._prepare_generation(latents0, text, speed, video_noise)
        b, _, h, w, c = x_emb0.shape

        l1 = self.frames_length - 1
        buffer0 = jnp.broadcast_to(x_emb0, (b, l1, h, w, c)).astype(x_emb0.dtype)

        decoder = self.generate_model
        if self.use_cids:
            pred0 = jnp.zeros((b, l1, h, w, self.codebook_size), x_emb0.dtype)
        else:
            pred0 = jnp.zeros((b, l1, h, w, self.dec_out_channels), x_emb0.dtype)

        def body(i, carry):
            buf, _ = carry
            imgs_emb = self.stem(buf)
            prediction = decoder(anchor, imgs_emb, train=False)
            if self.use_cids:
                frame_ids = jnp.argmax(
                    jax.lax.dynamic_slice_in_dim(prediction, i, 1, axis=1), axis=-1
                )  # (B, 1, h, w)
                new_emb = self.embed_latents(frame_ids)
            else:
                frame = jax.lax.dynamic_slice_in_dim(prediction, i, 1, axis=1)
                new_emb = self.embed_latents(frame)
            # slot i+1 <- embedding of prediction i; the final iteration's
            # write lands beyond the buffer and is dropped via clamp+mask
            write_idx = jnp.minimum(i + 1, l1 - 1)
            updated = jax.lax.dynamic_update_slice_in_dim(buf, new_emb, write_idx, 1)
            buf = jnp.where(i + 1 <= l1 - 1, updated, buf)
            return buf, prediction

        if self.is_initializing():
            # params first touched inside a fori_loop body would be returned
            # as stale tracers by init; create them in this (outer) scope
            return body(jnp.int32(0), (buffer0, pred0))[1]

        _, prediction = jax.lax.fori_loop(0, l1, body, (buffer0, pred0))
        if self.use_cids:
            return jnp.argmax(prediction, axis=-1).astype(jnp.int32)
        return prediction

    def generate_cached(
        self,
        latents0: jax.Array,
        text: jax.Array,
        speed: Optional[jax.Array] = None,
        video_noise: Optional[jax.Array] = None,
        temperature: float = 0.0,
        top_k: int = 0,
    ) -> jax.Array:
        """KV-cached autoregressive generation: O(L) single-slot decoder
        passes instead of the reference's O(L^2) full passes
        (mage_model.py:673-677) — exact for discrete ids because every
        layer is per-slot except the causally-masked temporal attention,
        which the cache reproduces exactly
        (proved against the actual reference loop in
        tests/test_reference_parity.py::test_mage_discrete_full_parity).

        Continuous (MAGE+) head: the reference's GroupNorm normalizes over
        all L-1 buffer slots each iteration (:350-354,384-389), *including
        stale future slots* still holding the first-frame embedding. Those
        stale slots' trunk outputs change every iteration (slot j attends
        over keys 0..j, and keys flip from stale to real as generation
        advances), so slot i's reference output depends on
        iteration-varying statistics of the not-yet-generated region — an
        exact sampler therefore must recompute the stale tail every step and
        is inherently O(L^2); use ``generate`` for bit-parity. This fast
        path instead accumulates GroupNorm statistics causally over the
        *valid* slots generated so far — which is also *closer to training
        semantics* than the reference loop (teacher-forced training
        normalizes over L-1 all-real slots; there are no stale slots), and
        converges to exactly the all-real statistics at the final slot. For
        frames_length == 2 (a single generated slot) the two samplers are
        identical (tested in tests/test_mage_model.py).

        ``temperature``/``top_k`` (discrete head only; extension beyond the
        reference, which decodes greedily): temperature > 0 samples ids
        from softmax(logits / temperature), optionally restricted to the
        top_k logits. temperature == 0 (default) is the reference's exact
        greedy argmax.
        """
        x_emb0, anchor = self._prepare_generation(latents0, text, speed, video_noise)
        b, _, h, w, c = x_emb0.shape
        decoder = self.generate_model
        assert temperature == 0.0 or self.use_cids, (
            "temperature sampling only applies to the discrete head"
        )
        sample_key = (
            self.make_rng("latent") if (self.use_cids and temperature > 0) else None
        )

        cache = decoder.init_cache(b, h, w, x_emb0.dtype)
        _, cache = decoder.decode_slot(anchor, jnp.int32(0), cache, is_anchor=True)
        slot1 = self.stem(x_emb0)[:, 0]  # embedding of frame 0 at slot 1
        gn_state = decoder.init_gn_state(b, x_emb0.dtype) if not self.use_cids else ()

        def step(carry, pos):
            slot_in, cache, gn_state = carry
            trunk, cache = decoder.decode_slot(slot_in, pos, cache)
            if self.use_cids:
                pred = decoder.head_slot(trunk)
                if temperature > 0:
                    logits = pred.astype(jnp.float32) / temperature
                    if 0 < top_k < self.codebook_size:
                        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
                        logits = jnp.where(logits < kth, NEG_INF, logits)
                    frame = jax.random.categorical(
                        jax.random.fold_in(sample_key, pos), logits
                    ).astype(jnp.int32)
                else:
                    frame = jnp.argmax(pred, axis=-1).astype(jnp.int32)  # (B, h, w)
            else:
                frame, gn_state = decoder.head_causal(trunk, gn_state)
            next_emb = self.embed_latents(frame)
            next_slot = self.stem(next_emb[:, None])[:, 0]
            return (next_slot, cache, gn_state), frame

        if self.is_initializing():
            # in_linear and the head are first touched inside the scan body;
            # params created there would be returned as stale tracers by
            # init — run one step in this (outer) scope instead
            _, frame0 = step((slot1, cache, gn_state), jnp.int32(1))
            return jnp.broadcast_to(
                frame0[:, None], (b, self.frames_length - 1) + frame0.shape[1:]
            )

        _, frames = jax.lax.scan(
            step,
            (slot1, cache, gn_state),
            jnp.arange(1, self.frames_length, dtype=jnp.int32),
        )
        # (L-1, B, ...) -> (B, L-1, ...)
        return jnp.moveaxis(frames, 0, 1)
