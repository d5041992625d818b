"""Two-stage TI2V pipeline: frozen first stage + MAGECore.

The reference's ``MAGE`` module owns its first stage and freezes it inside
the nn.Module (mage_model.py:466,516-521, requiring DDP's
``find_unused_parameters=True``, main_mage.py:95). TPU-native composition:
the first stage is a separate (model-def, variables) pair whose params
never enter the optimizer — explicit state instead of monkeypatched
freezing — and the train step fuses first-stage encode (under
stop_gradient) with the stage-2 forward in one jitted program.

Config schema parity: ``MagePipeline.from_config`` consumes the reference's
nested YAML layout (first_stage_config / text_encoder_config / ma_config /
generate_decoder_config: config/mage_caterv1.yaml:10-69).
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp

from mage_tpu.models.mage import FlatAxialDecoder, MAGECore
from mage_tpu.models.vqvae import VectorQuantizedVAE


def _chunked_frames(fn, flat: jax.Array, max_chunk: int = 512) -> jax.Array:
    """Apply a per-frame model over (N, ...) in HBM-bounded chunks via
    lax.map. The batch-folded first-stage conv stacks otherwise materialize
    O(N * H * W * C_mid) activation temps — at CATER scale that exceeds
    v5e HBM once N reaches ~1000 frames (measured: 960 frames at 128px
    needs >22 GB unchunked; 480 fits). Chunking serializes, so the
    threshold is set just under the single-shot HBM ceiling."""
    n = flat.shape[0]
    if n <= max_chunk:
        return fn(flat)
    chunk = max_chunk
    while n % chunk:  # largest divisor of n not exceeding max_chunk
        chunk -= 1
    if chunk <= 1:
        return fn(flat)
    chunks = flat.reshape(n // chunk, chunk, *flat.shape[1:])
    out = jax.lax.map(fn, chunks)
    return out.reshape(n, *out.shape[2:])


class FirstStageVQVAE:
    """Frozen VQ-VAE wrapper: video-batched encode/decode
    (reference first_stage_encode/decode, mage_model.py:530-567)."""

    def __init__(self, model: VectorQuantizedVAE, variables: Mapping[str, Any]):
        self.model = model
        self.variables = dict(variables)
        self.embed_dim = model.embed_dim
        self.is_discrete = True

    @classmethod
    def from_config(cls, params: Mapping[str, Any], variables=None):
        p = dict(params)
        ckpt_path = p.pop("ckpt_path", None)
        ignore_keys = p.pop("ignore_keys", ())
        model = VectorQuantizedVAE(**p)
        if variables is None:
            if ckpt_path:
                variables = load_first_stage_variables(ckpt_path, ignore_keys)
            else:
                variables = model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 16 * model.down_ratio, 16 * model.down_ratio,
                               model.input_dim), jnp.float32),
                    train=True,
                )
        return cls(model, variables)

    def encode(self, videos: jax.Array, variables=None,
               max_chunk: int = 512) -> jax.Array:
        """(B, T, H, W, C) -> (B, T, h, w) int32 ids (no gradients).

        ``variables`` lets jitted callers pass the frozen weights as traced
        arguments instead of baking them into the executable as constants.
        ``max_chunk`` bounds frames per dispatch (the 512 default is sized
        for bf16 at 128px; f32 encodes at that resolution need ~256)."""
        variables = self.variables if variables is None else variables
        b, t = videos.shape[:2]
        flat = videos.reshape(b * t, *videos.shape[2:])
        ids = _chunked_frames(
            lambda c: self.model.apply(variables, c, method="encode", mutable=False),
            flat, max_chunk=max_chunk,
        )
        return jax.lax.stop_gradient(ids.reshape(b, t, *ids.shape[1:]))

    def decode(self, latents: jax.Array, variables=None,
               max_chunk: int = 512) -> jax.Array:
        """(B, T, h, w) ids -> (B, T, H, W, C). ``max_chunk`` as in
        :meth:`encode` — halve it for f32 decodes at 128px."""
        variables = self.variables if variables is None else variables
        b, t = latents.shape[:2]
        flat = latents.reshape(b * t, *latents.shape[2:])
        frames = _chunked_frames(
            lambda c: self.model.apply(variables, c, method="decode", mutable=False),
            flat, max_chunk=max_chunk,
        )
        return jax.lax.stop_gradient(frames.reshape(b, t, *frames.shape[1:]))


def load_first_stage_variables(ckpt_path: str, ignore_keys=()) -> dict:
    """Load {params, batch_stats} from an orbax checkpoint written by the
    stage-1 trainer (a VQVAETrainState tree or a bare variables dict).
    ``ignore_keys``: drop params whose top-level name starts with any prefix
    (reference init_from_ckpt, vqvae_model.py:222-231)."""
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
    if "params" in restored:
        params = dict(restored["params"])
        for ik in ignore_keys:
            for k in list(params):
                if k.startswith(ik):
                    print(f"Deleting key {k} from first-stage params.")
                    del params[k]
        return {
            "params": params,
            "batch_stats": restored.get("batch_stats", {}),
        }
    raise ValueError(f"unrecognized first-stage checkpoint layout at {ckpt_path}")


class MagePipeline:
    """First stage + MAGECore + loss/generation glue. The config target for
    stage-2 models (parity with reference MAGE's constructor signature,
    mage_model.py:446-463)."""

    def __init__(
        self,
        first_stage_config: Mapping[str, Any],
        text_encoder_config: Mapping[str, Any],
        ma_config: Mapping[str, Any],
        generate_decoder_config: Mapping[str, Any],
        codebook_size: int,
        frames_length: int,
        image_resolution: int,
        vision_width: int,
        dropout: float = 0.1,
        use_cids: bool = False,
        randomness: bool = False,
        alpha: float = 0.0,
        beta: float = 1.0,
        v_kl: float = 0.0,
        auto_beta: bool = False,
        remat: bool = False,
        motion_loss_weight: float = 0.0,
        early_loss_weight: float = 0.0,
        early_loss_frames: int = 3,
        first_stage_variables=None,
    ):
        self.use_cids = use_cids
        self.randomness = randomness
        self.alpha = alpha
        self.beta = beta
        self.v_kl = v_kl
        self.auto_beta = auto_beta
        self.frames_length = frames_length

        from mage_tpu.config import resolve_target
        from mage_tpu.models.autoencoder_kl import AutoencoderKL, FirstStageKL
        from mage_tpu.models.layers import MAEncoder, TransformerTextEncoder

        # every sub-component class comes from its config ``target``
        # (reference instantiate_from_config at mage_model.py:474-477;
        # reference class paths are alias-resolved to mage_tpu classes)
        fs_cls = resolve_target(first_stage_config, VectorQuantizedVAE)
        fs_params = first_stage_config.get("params", {})
        if fs_cls is AutoencoderKL:
            self.first_stage = FirstStageKL.from_config(
                fs_params, variables=first_stage_variables
            )
        elif fs_cls is VectorQuantizedVAE:
            self.first_stage = FirstStageVQVAE.from_config(
                fs_params, variables=first_stage_variables
            )
        else:  # custom first stages opt in via a classmethod hook
            self.first_stage = fs_cls.as_first_stage(
                fs_params, variables=first_stage_variables
            )

        te_cls = resolve_target(text_encoder_config, TransformerTextEncoder)
        ma_cls = resolve_target(ma_config, MAEncoder)
        dec_cls = resolve_target(generate_decoder_config, FlatAxialDecoder)

        te = dict(text_encoder_config.get("params", {}))
        ma = dict(ma_config.get("params", {}))
        dec = dict(generate_decoder_config.get("params", {}))
        overrides = {}
        if te_cls is not TransformerTextEncoder:
            overrides["text_encoder_cls"] = te_cls
            overrides["text_encoder_params"] = te
        if ma_cls is not MAEncoder:
            overrides["ma_cls"] = ma_cls
            overrides["ma_params"] = ma
        if dec_cls is not FlatAxialDecoder:
            overrides["decoder_cls"] = dec_cls
            overrides["decoder_params"] = dec
        self.core = MAGECore(
            **overrides,
            codebook_size=codebook_size,
            frames_length=frames_length,
            image_resolution=image_resolution,
            vision_width=vision_width,
            embed_dim=getattr(self.first_stage, "embed_dim", 4),
            dropout=dropout,
            use_cids=use_cids,
            randomness=randomness,
            remat=remat,
            motion_loss_weight=motion_loss_weight,
            early_loss_weight=early_loss_weight,
            early_loss_frames=early_loss_frames,
            pre_ln=not use_cids,  # MAGE+ uses the pre-LN cross-attn variant
            text_vocab_size=te.get("vocab_size", 30),
            text_context_length=te.get("context_length", 32),
            text_width=te.get("transformer_width", 512),
            text_layers=te.get("transformer_layers", 2),
            text_output_dim=te.get("output_dim", 512),
            text_padding_idx=te.get("padding_idx", 0),
            text_dropout=te.get("dropout", dropout),
            ma_layers=ma.get("layers", 1),
            ma_d_model=ma.get("d_model", 512),
            dec_layers=dec.get("layers", 6),
            dec_out_channels=dec.get("out_channels", codebook_size if use_cids else 4),
        )

    # ------------------------------------------------------------------

    def encode_first_stage(
        self, images: jax.Array, rng: Optional[jax.Array] = None, fs_variables=None
    ):
        """Videos -> latents; stochastic (DiagonalGaussian sample) for the
        KL first stage (reference get_first_stage_encoding,
        mage_model.py:542-549)."""
        if getattr(self.first_stage, "is_discrete", True):
            return self.first_stage.encode(images, variables=fs_variables)
        return self.first_stage.encode(images, rng=rng, variables=fs_variables)

    def init(self, rng: jax.Array, batch: Mapping[str, jax.Array]):
        # Parameter shapes are batch-size independent: init from a 1-sample
        # slice, and get latent shapes via eval_shape so no full-resolution
        # encoder activations are ever materialized eagerly.
        images1 = jnp.asarray(batch["images"][:1])
        lat_shape = jax.eval_shape(
            lambda im: self.encode_first_stage(im, jax.random.PRNGKey(0)), images1
        )
        latents = jnp.zeros(lat_shape.shape, lat_shape.dtype)
        speed = batch.get("speed")
        rngs = {"params": rng, "dropout": rng, "latent": rng}
        # jit the whole init: one compiled program instead of hundreds of
        # eager op dispatches (critical on remote-execution backends)
        init_fn = jax.jit(
            lambda rngs, lat, txt, spd: self.core.init(
                rngs, lat, txt, spd, train=True
            )["params"]
        )
        return init_fn(
            rngs,
            latents,
            jnp.asarray(batch["text"][:1]),
            jnp.asarray(speed[:1]) if speed is not None else None,
        )

    def loss_terms(
        self,
        params,
        batch: Mapping[str, jax.Array],
        rng: jax.Array,
        train: bool = True,
        test_flag: bool = False,
        fs_variables=None,
        compute_dtype=None,
    ):
        """-> dict of raw loss terms (jnp scalars) + predictions.

        ``batch`` carries either ``images`` (pixels, encoded through the
        frozen first stage here — the reference's only path,
        mage_model.py:575-578) or precomputed ``latents`` (latent-cached
        training: stage-1 encode is deterministic per frame for the
        discrete VQ first stage, so caching it is exact and removes the
        per-step encode cost entirely — see data/device_data.py).

        ``compute_dtype`` casts the stage-2 inputs AFTER the frozen
        first-stage encode (same contract as ``generate``): pixels go
        through the f32 first stage so VQ conditioning ids match the f32
        run, and continuous (KL) latents are cast so the transformer
        actually runs in the reduced precision."""
        enc_rng, drop_rng, lat_rng = jax.random.split(rng, 3)
        if "latents" in batch:
            latents = jnp.asarray(batch["latents"])
        else:
            latents = self.encode_first_stage(
                jnp.asarray(batch["images"]), enc_rng, fs_variables
            )
        speed = batch.get("speed")
        context = batch.get("context_latents")
        if context is not None:
            context = jnp.asarray(context)
        if compute_dtype is not None:
            if jnp.issubdtype(latents.dtype, jnp.floating):
                latents = latents.astype(compute_dtype)
            if context is not None and jnp.issubdtype(
                context.dtype, jnp.floating
            ):
                context = context.astype(compute_dtype)
            if speed is not None:
                speed = jnp.asarray(speed).astype(compute_dtype)
        out = self.core.apply(
            {"params": params},
            latents,
            batch["text"],
            speed,
            train=train,
            test_flag=test_flag,
            context_latents=context,
            rngs={"dropout": drop_rng, "latent": lat_rng},
        )
        out.pop("predict")
        return out

    def generate(
        self,
        params,
        batch: Mapping[str, jax.Array],
        rng: jax.Array,
        fs_variables=None,
        cached: Optional[bool] = None,
        compute_dtype=None,
        temperature: float = 0.0,
        top_k: int = 0,
    ) -> jax.Array:
        """batch (first frame + text [+ speed]) -> full video (B, L, H, W, C)
        with the ground-truth first frame prepended (reference :686-691).

        ``cached`` selects the O(L) KV-cached sampler (default for discrete
        ids, where it is exact; the continuous head defaults to the naive
        reference-parity loop — see MAGECore.generate_cached).

        ``temperature``/``top_k`` enable stochastic id decoding on the
        cached sampler (0 = the reference's greedy argmax; discrete only).

        ``compute_dtype`` (e.g. bfloat16) casts the stage-2 inputs crossing
        into the core so a caller passing bf16 ``params`` gets a fully-bf16
        transformer while the FROZEN FIRST STAGE stays at its own precision
        — its VQ argmin must produce the same conditioning ids as f32
        (same contract as bf16 training, training/mage_trainer.py)."""
        if cached is None:
            cached = self.use_cids
        enc_rng, lat_rng = jax.random.split(rng)
        first = jnp.asarray(batch["images"])[:, 0:1]
        latents0 = self.encode_first_stage(first, enc_rng, fs_variables)
        speed = batch.get("speed")
        if compute_dtype is not None:
            if jnp.issubdtype(latents0.dtype, jnp.floating):
                latents0 = latents0.astype(compute_dtype)
            if speed is not None:
                speed = speed.astype(compute_dtype)
        kwargs = {}
        if temperature > 0:
            if not cached:
                raise ValueError("temperature sampling requires cached=True")
            kwargs = {"temperature": temperature, "top_k": top_k}
        gen_latents = self.core.apply(
            {"params": params},
            latents0,
            batch["text"],
            speed,
            method="generate_cached" if cached else "generate",
            rngs={"latent": lat_rng},
            **kwargs,
        )
        video = self.first_stage.decode(gen_latents, variables=fs_variables)
        return jnp.concatenate([first, video], axis=1)
