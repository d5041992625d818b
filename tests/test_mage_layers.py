"""Stage-2 layer tests: attention semantics (causal/padding masks), axial
block shape-preservation, text encoder, 3D blocks, AdaIN."""

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.models.layers import (
    AdaIN2D,
    AxialAttentionBlock,
    BasicBlock3D,
    CrossAttentionBlock,
    MAEncoder,
    MultiHeadAttention,
    TransformerTextEncoder,
    quick_gelu,
)
from mage_tpu.models.mage import causal_temporal_bias


def test_quick_gelu_matches_reference_formula():
    x = jnp.linspace(-3, 3, 13)
    np.testing.assert_allclose(
        np.asarray(quick_gelu(x)),
        np.asarray(x) * (1.0 / (1.0 + np.exp(-1.702 * np.asarray(x)))),
        rtol=1e-6,
    )


def test_mha_key_padding_mask_blocks_positions():
    """Outputs must be invariant to the *content* of masked key positions."""
    mha = MultiHeadAttention(d_model=32, n_head=4)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 5, 32))
    k1 = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    k2 = k1.at[:, 5:].set(999.0)  # mutate masked tail
    mask = jnp.zeros((2, 7), bool).at[:, 5:].set(True)
    params = mha.init(rng, q, k1, k1, key_padding_mask=mask, train=False)
    o1 = mha.apply(params, q, k1, k1, key_padding_mask=mask, train=False)
    o2 = mha.apply(params, q, k2, k2, key_padding_mask=mask, train=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_axial_block_attends_only_chosen_axis():
    """A perturbation at (t0, h0, w0) must only affect outputs sharing the
    non-attended coordinates (information moves along one axis only)."""
    block = AxialAttentionBlock(d_model=32, n_head=4, dropout=0.0, axial_dim=2)  # H
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 3, 4, 5, 32))
    params = block.init(rng, x, train=False)
    y = block.apply(params, x, train=False)
    assert y.shape == x.shape

    x2 = x.at[0, 1, 2, 3].add(10.0)
    y2 = block.apply(params, x2, train=False)
    delta = np.abs(np.asarray(y2 - y)).sum(axis=-1)[0]  # (T, H, W)
    assert delta[1, :, 3].sum() > 1e-3  # same t, same w: affected along H
    delta_elsewhere = delta.copy()
    delta_elsewhere[1, :, 3] = 0
    assert delta_elsewhere.sum() < 1e-4  # nothing else moves


def test_causal_temporal_mask_blocks_future():
    block = AxialAttentionBlock(d_model=32, n_head=4, dropout=0.0, axial_dim=1)  # T
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 6, 2, 2, 32))
    bias = causal_temporal_bias(6)
    params = block.init(rng, x, attn_bias=bias, train=False)
    y = block.apply(params, x, attn_bias=bias, train=False)
    x2 = x.at[0, 4].add(10.0)  # perturb frame 4
    y2 = block.apply(params, x2, attn_bias=bias, train=False)
    delta = np.abs(np.asarray(y2 - y)).sum(axis=(2, 3, 4))[0]  # per frame
    assert delta[:4].sum() < 1e-4  # past unaffected
    assert delta[4:].sum() > 1e-3  # frame 4 and future affected


def test_cross_attention_block_variants():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 4, 64))
    kv = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 64))
    for pre_ln in (False, True):
        blk = CrossAttentionBlock(64, 2, dropout=0.0, pre_ln=pre_ln)
        params = blk.init(rng, q, kv, kv, train=False)
        out = blk.apply(params, q, kv, kv, train=False)
        assert out.shape == q.shape
        names = set(jax.tree_util.tree_map(lambda x: 0, params["params"]).keys())
        assert ("ln_q" in names) == pre_ln  # MAGE vs MAGE+ param surface


def test_ma_encoder_stack():
    rng = jax.random.PRNGKey(0)
    enc = MAEncoder(layers=2, d_model=64, dropout=0.0)
    q = jax.random.normal(rng, (2, 16, 64))
    kv = jax.random.normal(rng, (2, 7, 64))
    params = enc.init(rng, q, kv, train=False)
    out = enc.apply(params, q, kv, train=False)
    assert out.shape == (2, 16, 64)


def test_text_encoder_padding_length_invariance():
    """Real-position embeddings must not depend on how much padding follows
    (padded keys are masked out of attention; this is the static-context
    padding divergence documented in datasets.py)."""
    enc = TransformerTextEncoder(
        vocab_size=30, transformer_width=64, transformer_layers=2,
        output_dim=32, context_length=16, dropout=0.0,
    )
    rng = jax.random.PRNGKey(0)
    text = jnp.zeros((2, 16), jnp.int32)
    text = text.at[:, 0].set(1).at[:, 1:5].set(13).at[:, 5].set(2)  # len 6
    params = enc.init(rng, text, train=False)
    out16 = enc.apply(params, text, train=False)
    assert out16.shape == (2, 16, 32)
    out8 = enc.apply(params, text[:, :8], train=False)  # 2 pads instead of 10
    np.testing.assert_allclose(
        np.asarray(out16[:, :6]), np.asarray(out8[:, :6]), atol=1e-5
    )


def test_basic_block3d_strides():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 10, 8, 8, 32))
    blk = BasicBlock3D(out_planes=32, stride=1, stride_t=2, downsample=True)
    params = blk.init(rng, x)
    y = blk.apply(params, x)
    assert y.shape == (2, 5, 8, 8, 32)
    # temporal pyramid 10 -> 5 -> 3 -> 2 -> 1 (reference conv3d stack :496-501)
    for expect in (3, 2, 1):
        params = blk.init(rng, y)
        y = blk.apply(params, y)
        assert y.shape[1] == expect


def test_adain_modulates():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    ada = AdaIN2D(16)
    params = ada.init(rng, x, y)
    o1 = ada.apply(params, x, y)
    o2 = ada.apply(params, x, y * 2.0)
    assert o1.shape == x.shape
    assert float(jnp.abs(o1 - o2).max()) > 1e-6  # conditioning matters


def test_spectral_norm_sigma_matches_torch():
    """BasicBlock3D's spectral flag must reproduce torch.nn.utils.
    spectral_norm (reference mage_model.py:277-279): persistent 1-step
    power iteration per training forward, kernel divided by the top
    singular value. Both sides iterate from different random u vectors, so
    compare after enough steps for the power iteration to converge."""
    import flax.linen as nn
    import torch

    rng = np.random.RandomState(0)
    cin, cout = 4, 6
    w = rng.randn(cout, cin, 3, 3, 3).astype(np.float32)
    x = rng.randn(2, cin, 5, 5, 5).astype(np.float32)

    tconv = torch.nn.Conv3d(cin, cout, 3, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
    tconv = torch.nn.utils.spectral_norm(tconv)  # n_power_iterations=1
    tconv.train()
    tx = torch.from_numpy(x)
    for _ in range(60):
        with torch.no_grad():
            t_out = tconv(tx)

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, y, update: bool = False):
            conv = nn.Conv(cout, (3, 3, 3), padding=1, use_bias=False)
            return nn.SpectralNorm(conv, error_on_non_matrix=False)(
                y, update_stats=update
            )

    xx = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    variables = Wrap().init(jax.random.PRNGKey(1), xx)
    variables = {
        "params": {"Conv_0": {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0))}},
        "batch_stats": variables["batch_stats"],
    }
    stats = variables["batch_stats"]
    for _ in range(60):
        out, mut = Wrap().apply(
            {"params": variables["params"], "batch_stats": stats},
            xx, update=True, mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
    np.testing.assert_allclose(
        np.asarray(out), t_out.numpy().transpose(0, 2, 3, 4, 1),
        rtol=2e-3, atol=2e-4,
    )


def test_spectral_block_updates_u_in_training_and_raises_otherwise():
    import flax.errors
    import pytest

    blk = BasicBlock3D(out_planes=32, spectral=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 4, 32), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables  # power-iteration state exists

    # training step: u must change (persistent power iteration)
    _, mut = blk.apply(variables, x, train=True, mutable=["batch_stats"])
    leaves0 = jax.tree_util.tree_leaves(variables["batch_stats"])
    leaves1 = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves1)
    )

    # eval reuses the stored estimate deterministically, no mutation needed
    out1 = blk.apply(variables, x, train=False)
    out2 = blk.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # a silently-frozen spectral norm is impossible: training without a
    # mutable batch_stats collection is a loud error
    with pytest.raises(flax.errors.ModifyScopeVariableError):
        blk.apply(variables, x, train=True)
