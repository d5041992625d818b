"""Opt-in motion-weighted reconstruction loss (MAGECore.motion_loss_weight).

Default 0 is the reference-exact uniform mean (mage_model.py:618-620); the
weighted path scales each target token's loss by 1 + w*moved, normalized
to mean 1 — tested against a manual recomputation from the returned
logits/predictions, plus the invariance cases (nothing moved / everything
moved -> identical to uniform)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_mage_model import L, K, _batch, _core, _init


def _terms(core, params, latents, text, speed):
    return core.apply(
        {"params": params}, latents, text, speed, train=False,
        rngs={"dropout": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)},
    )


def test_discrete_weighted_matches_manual():
    core = _core(use_cids=True)
    latents, text, speed = _batch(use_cids=True)
    params = _init(core, latents, text, speed)["params"]
    base = _terms(core, params, latents, text, speed)

    mlw = 2.5
    wcore = core.clone(motion_loss_weight=mlw)
    got = _terms(wcore, params, latents, text, speed)

    # manual: per-token CE from the same logits, weights from id changes
    logits = np.asarray(base["predict"], np.float32).reshape(-1, K)
    labels = np.asarray(latents[:, 1:L]).reshape(-1)
    logp = logits - jax.nn.logsumexp(jnp.asarray(logits), axis=-1, keepdims=True)
    tok_ce = -np.asarray(logp)[np.arange(labels.size), labels]
    moved = (np.asarray(latents[:, 1:L]) != np.asarray(latents[:, : L - 1]))
    w = 1.0 + mlw * moved.astype(np.float32)
    w = (w / w.mean()).reshape(-1)
    np.testing.assert_allclose(
        float(got["prediction"]), float((tok_ce * w).mean()), rtol=1e-5
    )
    # random ids: nearly everything moves, but not exactly everything
    assert 0 < moved.mean() < 1


def test_continuous_weighted_matches_manual():
    core = _core(use_cids=False)
    latents, text, speed = _batch(use_cids=False)
    params = _init(core, latents, text, speed)["params"]
    base = _terms(core, params, latents, text, speed)

    mlw = 3.0
    wcore = core.clone(motion_loss_weight=mlw)
    got = _terms(wcore, params, latents, text, speed)

    pred = np.asarray(base["predict"], np.float32)
    target = np.asarray(latents[:, 1:L], np.float32)
    prev = np.asarray(latents[:, : L - 1], np.float32)
    d2 = ((target - prev) ** 2).mean(-1)
    w = 1.0 + mlw * d2 / (d2.mean() + 1e-8)
    w = w / w.mean()
    want = (((pred - target) ** 2).mean(-1) * w).mean()
    np.testing.assert_allclose(float(got["prediction"]), want, rtol=1e-5)


def test_zero_weight_and_uniform_motion_reduce_to_reference_loss():
    core = _core(use_cids=True)
    latents, text, speed = _batch(use_cids=True)
    # static video: every frame identical -> moved==0 everywhere -> the
    # normalized weights are exactly 1 and the loss equals the uniform one
    static = jnp.tile(latents[:, :1], (1, L, 1, 1))
    params = _init(core, static, text, speed)["params"]
    base = _terms(core, params, static, text, speed)
    got = _terms(core.clone(motion_loss_weight=4.0), params, static, text, speed)
    np.testing.assert_allclose(
        float(got["prediction"]), float(base["prediction"]), rtol=1e-6
    )

    # all-moved video: weights again collapse to 1 after normalization
    moving = (static + 1 + jnp.arange(L, dtype=static.dtype)[None, :, None, None]) % K
    base_m = _terms(core, params, moving, text, speed)
    got_m = _terms(core.clone(motion_loss_weight=4.0), params, moving, text, speed)
    np.testing.assert_allclose(
        float(got_m["prediction"]), float(base_m["prediction"]), rtol=1e-6
    )


def test_pipeline_plumbs_motion_loss_weight():
    from mage_tpu.config import loads_config, instantiate_from_config

    cfg = loads_config(
        """
target: mage_tpu.models.pipeline.MagePipeline
params:
  codebook_size: 32
  frames_length: 4
  image_resolution: 8
  vision_width: 64
  use_cids: true
  motion_loss_weight: 2.0
  first_stage_config:
    target: mage_tpu.models.vqvae.VectorQuantizedVAE
    params: {input_dim: 1, dim: 16, down_ratio: 4, K: 32}
  text_encoder_config:
    target: mage_tpu.models.layers.TransformerTextEncoder
    params: {vocab_size: 30, context_length: 12, transformer_width: 64,
             transformer_layers: 1, output_dim: 64, padding_idx: 0, dropout: 0.1}
  ma_config:
    target: mage_tpu.models.layers.MAEncoder
    params: {layers: 1, d_model: 64}
  generate_decoder_config:
    target: mage_tpu.models.mage.FlatAxialDecoder
    params: {in_channels: 64, out_channels: 32, model_channels: 64,
             frames_length: 4, layers: 3}
"""
    )
    pipeline = instantiate_from_config(cfg)
    assert pipeline.core.motion_loss_weight == 2.0


def test_early_frame_weight_matches_manual_discrete():
    core = _core(use_cids=True)
    latents, text, speed = _batch(use_cids=True)
    params = _init(core, latents, text, speed)["params"]
    base = _terms(core, params, latents, text, speed)

    elw, nef = 4.0, 2
    wcore = core.clone(early_loss_weight=elw, early_loss_frames=nef)
    got = _terms(wcore, params, latents, text, speed)

    logits = np.asarray(base["predict"], np.float32).reshape(-1, K)
    labels = np.asarray(latents[:, 1:L]).reshape(-1)
    logp = logits - jax.nn.logsumexp(jnp.asarray(logits), axis=-1, keepdims=True)
    tok_ce = -np.asarray(logp)[np.arange(labels.size), labels]
    shape = latents[:, 1:L].shape  # (B, L-1, h, w)
    w = np.ones(shape, np.float32)
    w[:, :nef] *= 1.0 + elw
    w = (w / w.mean()).reshape(-1)
    np.testing.assert_allclose(
        float(got["prediction"]), float((tok_ce * w).mean()), rtol=1e-5
    )
    # the weighted loss must differ from uniform (weights are non-trivial)
    assert abs(float(got["prediction"]) - float(base["prediction"])) > 0


def test_early_frame_weight_composes_with_motion_weight_continuous():
    core = _core(use_cids=False)
    latents, text, speed = _batch(use_cids=False)
    params = _init(core, latents, text, speed)["params"]
    base = _terms(core, params, latents, text, speed)

    mlw, elw, nef = 3.0, 2.0, 1
    wcore = core.clone(motion_loss_weight=mlw, early_loss_weight=elw,
                       early_loss_frames=nef)
    got = _terms(wcore, params, latents, text, speed)

    pred = np.asarray(base["predict"], np.float32)
    target = np.asarray(latents[:, 1:L], np.float32)
    prev = np.asarray(latents[:, : L - 1], np.float32)
    d2 = ((target - prev) ** 2).mean(-1)
    w = 1.0 + mlw * d2 / (d2.mean() + 1e-8)
    w[:, :nef] *= 1.0 + elw
    w = w / w.mean()
    want = (((pred - target) ** 2).mean(-1) * w).mean()
    np.testing.assert_allclose(float(got["prediction"]), want, rtol=1e-5)


def test_early_frame_weight_covering_all_frames_is_uniform():
    # boost window >= all predicted frames -> normalization cancels it
    core = _core(use_cids=True)
    latents, text, speed = _batch(use_cids=True)
    params = _init(core, latents, text, speed)["params"]
    base = _terms(core, params, latents, text, speed)
    got = _terms(core.clone(early_loss_weight=5.0, early_loss_frames=L),
                 params, latents, text, speed)
    np.testing.assert_allclose(
        float(got["prediction"]), float(base["prediction"]), rtol=1e-6
    )
