"""KL autoencoder (MAGE+ first stage) tests: shapes at the reference's
ddconfig scale factor, DiagonalGaussian math, stochastic encode, and
round-trip through the pipeline wrapper."""

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.models.autoencoder_kl import (
    AutoencoderKL,
    DiagonalGaussian,
    FirstStageKL,
)


def _small_model(resolution=32):
    return AutoencoderKL(
        embed_dim=4, ch=32, ch_mult=(1, 2, 4), num_res_blocks=1,
        in_channels=3, out_ch=3, z_channels=4, double_z=True,
        resolution=resolution,
    )


def test_diagonal_gaussian_math():
    moments = jnp.concatenate(
        [jnp.full((2, 4, 4, 4), 1.5), jnp.zeros((2, 4, 4, 4))], axis=-1
    )  # mean 1.5, logvar 0
    g = DiagonalGaussian(moments)
    np.testing.assert_allclose(np.asarray(g.mode()), 1.5)
    # KL(N(1.5,1) || N(0,1)) = 0.5*1.5^2 per dim
    np.testing.assert_allclose(np.asarray(g.kl()), 0.5 * 1.5**2 * 4 * 4 * 4, rtol=1e-6)
    s1 = g.sample(jax.random.PRNGKey(0))
    s2 = g.sample(jax.random.PRNGKey(1))
    assert float(jnp.abs(s1 - s2).max()) > 0  # stochastic
    # logvar clamp
    g2 = DiagonalGaussian(jnp.concatenate(
        [jnp.zeros((1, 2, 2, 1)), jnp.full((1, 2, 2, 1), 100.0)], axis=-1))
    assert float(g2.logvar.max()) == 20.0


def test_autoencoder_shapes_f4():
    """ch_mult (1,2,4) -> 2 downsamples -> f4: 32 -> 8."""
    model = _small_model(32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    recon, posterior = model.apply(variables, x, jax.random.PRNGKey(2))
    assert recon.shape == (2, 32, 32, 3)
    assert posterior.mean.shape == (2, 8, 8, 4)
    moments = model.apply(variables, x, method="encode_moments")
    assert moments.shape == (2, 8, 8, 8)  # double_z
    dec = model.apply(variables, posterior.mode(), method="decode")
    assert dec.shape == (2, 32, 32, 3)


def test_first_stage_kl_wrapper_video_contract():
    fs = FirstStageKL.from_config(
        {
            "embed_dim": 4,
            "ddconfig": {
                "double_z": True, "z_channels": 4, "resolution": 32,
                "in_channels": 3, "out_ch": 3, "ch": 32,
                "ch_mult": [1, 2, 4], "num_res_blocks": 1,
                "attn_resolutions": [], "dropout": 0.0,
            },
            "lossconfig": {"target": "torch.nn.Identity"},
            "monitor": "val/rec_loss",
        }
    )
    assert fs.embed_dim == 4 and fs.is_discrete is False
    videos = jnp.asarray(np.random.RandomState(0).randn(2, 3, 32, 32, 3), jnp.float32)
    z1 = fs.encode(videos, jax.random.PRNGKey(0))
    z2 = fs.encode(videos, jax.random.PRNGKey(1))
    assert z1.shape == (2, 3, 8, 8, 4)
    assert float(jnp.abs(z1 - z2).max()) > 0  # stochastic targets per step
    out = fs.decode(z1)
    assert out.shape == videos.shape


def test_kl_gradients_and_recon_trainable():
    """One Adam step on MSE+KL reduces the loss (trainability smoke)."""
    import optax

    model = _small_model(32)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 32, 32, 3) - 0.5, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1))
    params = variables["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    def loss_fn(p, rng):
        recon, post = model.apply({"params": p}, x, rng)
        return jnp.mean((recon - x) ** 2) + 1e-6 * jnp.mean(post.kl())

    l0 = float(loss_fn(params, jax.random.PRNGKey(2)))
    for i in range(5):
        g = jax.grad(loss_fn)(params, jax.random.PRNGKey(2))
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params, jax.random.PRNGKey(2)))
    assert l1 < l0


def test_phased_up_conv_matches_naive(monkeypatch):
    """The decoder's upsample conv computed by phase decomposition at low
    resolution must equal conv3x3(nearest_up2(x)) exactly (same params:
    the two orders share one param tree)."""
    from mage_tpu.models.autoencoder_kl import _Up

    x = jnp.asarray(np.random.RandomState(0).randn(2, 7, 5, 16), jnp.float32)
    monkeypatch.setenv("MAGE_KL_UP", "naive")
    up = _Up()
    variables = up.init(jax.random.PRNGKey(3), x)
    naive = up.apply(variables, x)
    for variant in ("phased", "dilated"):
        monkeypatch.setenv("MAGE_KL_UP", variant)
        alt = up.apply(variables, x)
        assert alt.shape == naive.shape == (2, 14, 10, 16)
        np.testing.assert_allclose(
            np.asarray(alt), np.asarray(naive), rtol=2e-5, atol=2e-5,
            err_msg=variant,
        )
    monkeypatch.setenv("MAGE_KL_UP", "phased")
    # gradients flow through the recombined kernel identically
    g_n = jax.grad(
        lambda v: jnp.sum(up.apply(v, x) ** 2))(variables)
    monkeypatch.setenv("MAGE_KL_UP", "naive")
    g_p = jax.grad(
        lambda v: jnp.sum(up.apply(v, x) ** 2))(variables)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ),
        g_n, g_p,
    )


def test_fused_gnconv_decoder_matches_unfused(monkeypatch):
    """MAGE_KL_FUSED=gnconv routes every eligible ResnetBlock chain through
    the fused Pallas kernel (interpret on CPU) with the SAME param tree;
    the full decoder output must match the unfused flax chain."""
    from mage_tpu.models.autoencoder_kl import Decoder

    dec = Decoder(ch=128, ch_mult=[1, 2], num_res_blocks=1, out_ch=3,
                  resolution=16)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 4), jnp.float32)
    monkeypatch.delenv("MAGE_KL_FUSED", raising=False)
    variables = dec.init(jax.random.PRNGKey(0), z)
    want = dec.apply(variables, z)
    monkeypatch.setenv("MAGE_KL_FUSED", "gnconv_interpret")
    import mage_tpu.ops.gn_conv as gc

    calls = []
    real = gc.gn_silu_conv3x3
    monkeypatch.setattr(
        gc, "gn_silu_conv3x3",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1],
    )
    got = dec.apply(variables, z)
    # ch_mult [1,2] at res 16: 2 mid + (2 levels x 2 blocks) = 6 res
    # blocks, 2 fused chains each
    assert len(calls) == 12, len(calls)
    assert got.shape == want.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
    # init under the fused flag builds the identical param tree
    variables_f = dec.init(jax.random.PRNGKey(0), z)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0),
        variables, variables_f,
    )
