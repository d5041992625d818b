"""FULL-MODEL numeric parity against the actual reference PyTorch modules.

Builds the reference ``VectorQuantizedVAE`` (both down-ratios) and ``MAGE``
(discrete cids and continuous MAGE+ variants) from /root/reference with
random weights, exports their state_dicts through
``mage_tpu.compat.torch_import``, and asserts end-to-end numeric parity:

- encode ids identical (vqvae_model.py:233-237),
- teacher-forced logits/latents + loss terms within tolerance
  (mage_model.py:575-639),
- the full autoregressive generation identical / within tolerance
  (mage_model.py:641-693), including the first AR step.

Randomness is made deterministic on both sides by forcing the latent noise
to zero (torch.randn/randn_like and jax.random.normal patched to zeros),
which exercises the whole reparameterization/ADAIN branch while keeping the
comparison exact.

The reference's unavailable third-party deps are stubbed *for import only*
(omegaconf-backed utils.util, pytorch_transformers, ldm's
DiagonalGaussianDistribution) — all compared computation is the reference's
own code.
"""

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mage_tpu.compat.torch_import import import_mage_core, import_vqvae  # noqa: E402

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the real reference modules, stubbing unavailable deps."""
    if "modules.mage_model" not in sys.modules:
        if REF_ROOT not in sys.path:
            sys.path.insert(0, REF_ROOT)
        sys.modules.setdefault(
            "pytorch_transformers", types.ModuleType("pytorch_transformers")
        )

        ldm = types.ModuleType("ldm")
        ldm_models = types.ModuleType("ldm.models")
        ldm_auto = types.ModuleType("ldm.models.autoencoder")

        class DiagonalGaussianDistribution:  # isinstance target (mage_model.py:543)
            pass

        ldm_auto.DiagonalGaussianDistribution = DiagonalGaussianDistribution
        ldm.models = ldm_models
        ldm_models.autoencoder = ldm_auto
        sys.modules.setdefault("ldm", ldm)
        sys.modules.setdefault("ldm.models", ldm_models)
        sys.modules.setdefault("ldm.models.autoencoder", ldm_auto)

        # the real utils.util imports omegaconf; provide the three names
        # mage_model uses with identical semantics (util.py:45-63)
        util = types.ModuleType("utils.util")

        def get_obj_from_str(s):
            module, cls = s.rsplit(".", 1)
            return getattr(importlib.import_module(module), cls)

        def instantiate_from_config(config, merge=None):
            params = dict(config.get("params", {}))
            if merge:
                params.update(merge)
            return get_obj_from_str(config["target"])(**params)

        def default(val, d):
            if val is not None:
                return val
            return d() if callable(d) else d

        def zero_module(module):
            for p in module.parameters():
                p.detach().zero_()
            return module

        util.instantiate_from_config = instantiate_from_config
        util.default = default
        util.zero_module = zero_module
        utils_pkg = types.ModuleType("utils")
        utils_pkg.util = util
        sys.modules["utils"] = utils_pkg
        sys.modules["utils.util"] = util

    vm = importlib.import_module("modules.vqvae_model")
    mm = importlib.import_module("modules.mage_model")
    return types.SimpleNamespace(mage=mm, vqvae=vm)


def _randomize_bn_stats(model, seed):
    """Give BatchNorm running stats non-trivial values so eval-mode parity
    actually exercises the imported statistics."""
    g = np.random.RandomState(seed)
    for name, buf in model.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.tensor(g.randn(*buf.shape).astype(np.float32) * 0.1))
        elif name.endswith("running_var"):
            buf.copy_(
                torch.tensor((np.abs(g.randn(*buf.shape)) * 0.5 + 0.75).astype(np.float32))
            )


def _zero_noise(monkeypatch):
    """Force latent noise to zero on both frameworks (keeps every other
    computation — mu/logvar, KL, ADAIN — fully exercised and comparable)."""
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    monkeypatch.setattr(
        torch, "randn", lambda *sizes, **kw: torch.zeros(*sizes, **kw)
    )
    monkeypatch.setattr(
        jax.random,
        "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )


# ---------------------------------------------------------------------------
# Stage 1: VQ-VAE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("down_ratio,dim,K,res", [(4, 16, 32, 32), (8, 8, 16, 32)])
def test_vqvae_full_model_parity(ref, down_ratio, dim, K, res):
    from mage_tpu.models.vqvae import VectorQuantizedVAE

    torch.manual_seed(0)
    tmodel = ref.vqvae.VectorQuantizedVAE(
        input_dim=1, down_ratio=down_ratio, dim=dim, K=K
    )
    _randomize_bn_stats(tmodel, 1)
    tmodel.eval()

    variables = jax.tree_util.tree_map(
        jnp.asarray, import_vqvae(tmodel.state_dict(), down_ratio=down_ratio)
    )
    jmodel = VectorQuantizedVAE(input_dim=1, down_ratio=down_ratio, dim=dim, K=K)

    x = np.random.RandomState(2).randn(3, 1, res, res).astype(np.float32) * 0.5
    with torch.no_grad():
        t_ids = tmodel.encode(torch.tensor(x))
        t_dec = tmodel.decode(t_ids)
        t_x_tilde, t_z_e, t_z_q = tmodel(torch.tensor(x))

    x_j = jnp.asarray(x.transpose(0, 2, 3, 1))
    j_ids = jmodel.apply(variables, x_j, method="encode", mutable=False)
    np.testing.assert_array_equal(np.asarray(j_ids), t_ids.numpy())

    j_dec = jmodel.apply(variables, j_ids, method="decode", mutable=False)
    np.testing.assert_allclose(
        np.asarray(j_dec).transpose(0, 3, 1, 2), t_dec.numpy(), rtol=1e-4, atol=2e-5
    )

    # eval-mode full forward: straight-through recon + both latent branches
    j_x_tilde, j_z_e, j_z_q = jmodel.apply(variables, x_j, train=False)
    np.testing.assert_allclose(
        np.asarray(j_x_tilde).transpose(0, 3, 1, 2),
        t_x_tilde.numpy(),
        rtol=1e-4,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(j_z_e).transpose(0, 3, 1, 2), t_z_e.numpy(), rtol=1e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_z_q).transpose(0, 3, 1, 2), t_z_q.numpy(), rtol=1e-4, atol=2e-5
    )


# ---------------------------------------------------------------------------
# Stage 2: MAGE (discrete cids, randomness branch, real VQ-VAE first stage)
# ---------------------------------------------------------------------------

_B, _L, _RES, _LAT = 2, 4, 32, 8
_W, _K = 64, 32
_ALPHA, _BETA = 0.001, 0.0005


def _text_batch():
    text = np.zeros((_B, 12), np.int64)
    text[0, :6] = [1, 5, 7, 9, 11, 2]
    text[1, :4] = [1, 8, 3, 2]
    speed = np.array([0.3, 0.8], np.float32)
    return text, speed


def _build_ref_mage(ref, use_cids, first_stage_target, fs_params, embed_out):
    cfg = dict(
        first_stage_config={"target": first_stage_target, "params": fs_params},
        text_encoder_config={
            "target": "modules.mage_model.TransformerTextEncoder",
            "params": dict(
                vocab_size=30, transformer_width=_W, transformer_layers=1,
                output_dim=_W, context_length=12, padding_idx=0, dropout=0.1,
            ),
        },
        ma_config={
            "target": "modules.mage_model.MAEncoder",
            "params": {"layers": 1, "d_model": _W},
        },
        generate_decoder_config={
            "target": "modules.mage_model.FlatAxialDecoder",
            "params": {
                "in_channels": _W, "out_channels": embed_out,
                "model_channels": _W, "frames_length": _L, "layers": 3,
            },
        },
        codebook_size=_K,
        frames_length=_L,
        image_resolution=_LAT,
        vision_width=_W,
        dropout=0.1,
        use_cids=use_cids,
        randomness=True,
        alpha=_ALPHA,
        beta=_BETA,
    )
    torch.manual_seed(3)
    return ref.mage.MAGE(**cfg)


def test_mage_discrete_full_parity(ref, monkeypatch):
    """Images -> VQ encode -> teacher-forced forward -> AR generation, all
    compared against the reference MAGE with the same (imported) weights."""
    from mage_tpu.models.pipeline import MagePipeline

    _zero_noise(monkeypatch)

    tmage = _build_ref_mage(
        ref, True, "modules.vqvae_model.VectorQuantizedVAE",
        {"input_dim": 1, "down_ratio": 4, "dim": 16, "K": _K}, _K,
    )
    _randomize_bn_stats(tmage.first_stage_model, 4)
    tmage.eval()

    sd = tmage.state_dict()
    fs_sd = {
        k[len("first_stage_model."):]: v
        for k, v in sd.items()
        if k.startswith("first_stage_model.")
    }
    fs_vars = jax.tree_util.tree_map(jnp.asarray, import_vqvae(fs_sd, down_ratio=4))
    core_params = jax.tree_util.tree_map(
        jnp.asarray,
        import_mage_core(
            sd, use_cids=True, randomness=True, vision_width=_W, ma_d_model=_W,
            text_width=_W, text_layers=1, ma_layers=1, dec_layers=3,
        ),
    )

    pipeline = MagePipeline(
        first_stage_config={
            "target": "mage_tpu.models.vqvae.VectorQuantizedVAE",
            "params": {"input_dim": 1, "down_ratio": 4, "dim": 16, "K": _K},
        },
        text_encoder_config={
            "params": dict(vocab_size=30, context_length=12, transformer_width=_W,
                           transformer_layers=1, output_dim=_W, padding_idx=0,
                           dropout=0.1)
        },
        ma_config={"params": {"layers": 1, "d_model": _W}},
        generate_decoder_config={
            "params": {"in_channels": _W, "out_channels": _K, "model_channels": _W,
                       "frames_length": _L, "layers": 3}
        },
        codebook_size=_K, frames_length=_L, image_resolution=_LAT, vision_width=_W,
        dropout=0.1, use_cids=True, randomness=True, alpha=_ALPHA, beta=_BETA,
        first_stage_variables=fs_vars,
    )

    images = np.random.RandomState(5).rand(_B, _L, 1, _RES, _RES).astype(np.float32) - 0.5
    text, speed = _text_batch()
    images_t, text_t = torch.tensor(images), torch.tensor(text)
    speed_t = torch.tensor(speed)
    images_j = jnp.asarray(images.transpose(0, 1, 3, 4, 2))
    text_j, speed_j = jnp.asarray(text, jnp.int32), jnp.asarray(speed)

    # --- encode ids identical -------------------------------------------
    with torch.no_grad():
        t_latents = tmage.first_stage_encode(images_t)
    j_latents = pipeline.first_stage.encode(images_j)
    np.testing.assert_array_equal(np.asarray(j_latents), t_latents.numpy())

    # --- teacher-forced forward: logits + every loss term ----------------
    cap = {}
    hook = tmage.generate_model.register_forward_hook(
        lambda m, i, o: cap.__setitem__("pred", o.detach())
    )
    with torch.no_grad():
        t_final, t_loss = tmage(
            {"images": images_t, "text": text_t, "speed": speed_t}
        )
    hook.remove()

    out = pipeline.core.apply(
        {"params": core_params}, j_latents, text_j, speed_j, train=False,
        rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out["predict"]), cap["pred"].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out["prediction"]), t_loss["val/prediction"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(out["kl_loss"]), t_loss["val/kl_loss"], rtol=1e-4, atol=1e-6
    )
    j_final = (
        float(out["prediction"])
        + _BETA * float(out["kl_loss"])
        + _ALPHA * float(out["speed_l2"])
    )
    np.testing.assert_allclose(j_final, float(t_final), rtol=1e-5, atol=1e-6)

    # --- autoregressive generation: ids identical, video matches ---------
    cap2 = {}
    orig_decode = tmage.first_stage_decode

    def capture_decode(x):
        cap2["lat"] = x.detach().clone()
        return orig_decode(x)

    tmage.first_stage_decode = capture_decode
    with torch.no_grad():
        t_video = tmage.autoregressive_generate(
            {"images": images_t, "text": text_t, "speed": speed_t}
        )

    noise0 = jnp.zeros((_B, _LAT, _LAT, 64), jnp.float32)
    gen_ids = pipeline.core.apply(
        {"params": core_params}, j_latents[:, :1], text_j, speed_j,
        method="generate", video_noise=noise0,
    )
    np.testing.assert_array_equal(np.asarray(gen_ids), cap2["lat"].numpy())

    # the O(L) KV-cached sampler must agree with the reference loop too
    gen_ids_cached = pipeline.core.apply(
        {"params": core_params}, j_latents[:, :1], text_j, speed_j,
        method="generate_cached", video_noise=noise0,
    )
    np.testing.assert_array_equal(np.asarray(gen_ids_cached), cap2["lat"].numpy())

    j_video = pipeline.first_stage.decode(gen_ids)
    np.testing.assert_allclose(
        np.asarray(j_video).transpose(0, 1, 4, 2, 3),
        t_video[:, 1:].numpy(),
        rtol=1e-4,
        atol=2e-5,
    )


# ---------------------------------------------------------------------------
# Stage 2: MAGE+ (continuous latents, pre-LN cross-attention)
# ---------------------------------------------------------------------------


def _install_stub_first_stage():
    """Deterministic continuous 'first stage' (avg-pool + fixed channel
    scales) registered as an importable torch module, with a numpy twin."""
    if "parity_fs_stub" in sys.modules:
        return sys.modules["parity_fs_stub"]
    mod = types.ModuleType("parity_fs_stub")

    class StubFirstStage(torch.nn.Module):
        embed_dim = 4

        def encode(self, x):  # (N, 1, H, W) -> (N, 4, H/4, W/4)
            p = torch.nn.functional.avg_pool2d(x, 4)
            return torch.cat([p, 0.5 * p, -p, 2.0 * p], dim=1)

        def decode(self, z):  # (N, 4, h, w) -> (N, 1, 4h, 4w)
            up = z.mean(1, keepdim=True)
            return up.repeat_interleave(4, -2).repeat_interleave(4, -1)

    mod.StubFirstStage = StubFirstStage
    sys.modules["parity_fs_stub"] = mod
    return mod


def _np_stub_encode(x):  # (B, L, 1, H, W) -> (B, L, 4, H/4, W/4)
    b, l, c, h, w = x.shape
    p = x.reshape(b, l, c, h // 4, 4, w // 4, 4).mean(axis=(-1, -3))
    return np.concatenate([p, 0.5 * p, -p, 2.0 * p], axis=2)


def _preln_forward(self, q, k, v, key_mask=None, need_weights=False):
    """The MAGE+ variant of the reference TransformerBlock.forward — the
    pre-LN line the reference instructs to swap in (mage_model.py:92-93)."""
    x = q + self.dropout(
        self.attention(self.ln_q(q), self.ln_kv(k), self.ln_kv(v), key_mask)
    )
    x = x + self.dropout(self.mlp(self.ln_2(x)))
    return x


def test_mage_plus_continuous_full_parity(ref, monkeypatch):
    from mage_tpu.models.mage import MAGECore

    _zero_noise(monkeypatch)
    monkeypatch.setattr(ref.mage.TransformerBlock, "forward", _preln_forward)
    _install_stub_first_stage()

    tmage = _build_ref_mage(ref, False, "parity_fs_stub.StubFirstStage", {}, 4)
    # the reference zero-inits the continuous head (zero_module); randomize
    # it so AR generation is non-degenerate
    torch.nn.init.normal_(tmage.generate_model.out[2].weight, std=0.2)
    torch.nn.init.normal_(tmage.generate_model.out[2].bias, std=0.2)
    tmage.eval()

    sd = tmage.state_dict()
    core_params = jax.tree_util.tree_map(
        jnp.asarray,
        import_mage_core(
            sd, use_cids=False, randomness=True, vision_width=_W, ma_d_model=_W,
            text_width=_W, text_layers=1, ma_layers=1, dec_layers=3, pre_ln=True,
        ),
    )
    core = MAGECore(
        codebook_size=_K, frames_length=_L, image_resolution=_LAT, vision_width=_W,
        embed_dim=4, dropout=0.1, use_cids=False, randomness=True, pre_ln=True,
        text_vocab_size=30, text_context_length=12, text_width=_W, text_layers=1,
        text_output_dim=_W, ma_layers=1, ma_d_model=_W, dec_layers=3,
        dec_out_channels=4,
    )

    images = np.random.RandomState(6).rand(_B, _L, 1, _RES, _RES).astype(np.float32) - 0.5
    text, speed = _text_batch()
    latents = _np_stub_encode(images)  # (B, L, 4, 8, 8)
    latents_j = jnp.asarray(latents.transpose(0, 1, 3, 4, 2))
    text_j, speed_j = jnp.asarray(text, jnp.int32), jnp.asarray(speed)

    cap = {}
    hook = tmage.generate_model.register_forward_hook(
        lambda m, i, o: cap.__setitem__("pred", o.detach())
    )
    with torch.no_grad():
        t_final, t_loss = tmage(
            {"images": torch.tensor(images), "text": torch.tensor(text),
             "speed": torch.tensor(speed)}
        )
    hook.remove()

    out = core.apply(
        {"params": core_params}, latents_j, text_j, speed_j, train=False,
        rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.asarray(out["predict"]), cap["pred"].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(out["prediction"]), t_loss["val/prediction"], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(out["kl_loss"]), t_loss["val/kl_loss"], rtol=1e-4, atol=1e-6
    )

    # --- autoregressive generation (continuous latents) ------------------
    cap2 = {}
    orig_decode = tmage.first_stage_decode

    def capture_decode(x):
        cap2["lat"] = x.detach().clone()
        return orig_decode(x)

    tmage.first_stage_decode = capture_decode
    with torch.no_grad():
        tmage.autoregressive_generate(
            {"images": torch.tensor(images), "text": torch.tensor(text),
             "speed": torch.tensor(speed)}
        )

    noise0 = jnp.zeros((_B, _LAT, _LAT, 64), jnp.float32)
    gen_lat = core.apply(
        {"params": core_params}, latents_j[:, :1], text_j, speed_j,
        method="generate", video_noise=noise0,
    )
    np.testing.assert_allclose(
        np.asarray(gen_lat).transpose(0, 1, 4, 2, 3),
        cap2["lat"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
