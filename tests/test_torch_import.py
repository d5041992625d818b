"""Torch-checkpoint import: numeric parity of every layout transform
against torch.nn.functional ops, plus structural round-trip of a full
VQ-VAE state_dict into the flax tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import flax.linen as nn  # noqa: E402

from mage_tpu.compat.torch_import import (  # noqa: E402
    conv2d_kernel,
    convtranspose2d_kernel,
    import_vqvae,
    linear_kernel,
    out_proj_kernel,
    split_in_proj,
    strip_ddp_prefix,
)


def test_conv2d_transform_numeric():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)  # NCHW
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1).numpy()

    conv = nn.Conv(5, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(conv2d_kernel(w)),
                         "bias": jnp.asarray(b)}}
    out = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_convtranspose2d_transform_numeric():
    """torch ConvTranspose2d(k=4, s=2, p=1) == flax ConvTranspose with
    transpose_kernel + ((2,2),(2,2)) padding (flax pad = k-1-torch_p) (the VQ-VAE decoder geometry,
    reference vqvae_model.py:184-187)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 8, 8).astype(np.float32)
    w = rng.randn(6, 4, 4, 4).astype(np.float32)  # (I, O, kH, kW)
    b = rng.randn(4).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2, padding=1
    ).numpy()
    assert ref.shape == (2, 4, 16, 16)

    convt = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                             transpose_kernel=True)
    params = {"params": {"kernel": jnp.asarray(convtranspose2d_kernel(w)),
                         "bias": jnp.asarray(b)}}
    out = convt.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_linear_transform_numeric():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 7).astype(np.float32)
    w = rng.randn(4, 7).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    ref = (x @ w.T + b)
    dense = nn.Dense(4)
    out = dense.apply(
        {"params": {"kernel": jnp.asarray(linear_kernel(w)), "bias": jnp.asarray(b)}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_packed_mha_import_numeric():
    """torch nn.MultiheadAttention (packed in_proj) == our MultiHeadAttention
    with split kernels (SURVEY.md §7 hard-part 6)."""
    from mage_tpu.models.layers import MultiHeadAttention

    d, heads = 32, 4
    mha_t = torch.nn.MultiheadAttention(d, heads)  # seq-first
    mha_t.eval()
    rng = np.random.RandomState(3)
    q = rng.randn(5, 2, d).astype(np.float32)  # (L, B, D)
    kv = rng.randn(7, 2, d).astype(np.float32)
    with torch.no_grad():
        ref, _ = mha_t(torch.tensor(q), torch.tensor(kv), torch.tensor(kv),
                       need_weights=False)
    ref = ref.numpy()

    sd = mha_t.state_dict()
    (qk, qb), (kk, kb), (vk, vb) = split_in_proj(
        sd["in_proj_weight"], sd["in_proj_bias"], heads
    )
    params = {
        "params": {
            "q_proj": {"kernel": jnp.asarray(qk), "bias": jnp.asarray(qb)},
            "k_proj": {"kernel": jnp.asarray(kk), "bias": jnp.asarray(kb)},
            "v_proj": {"kernel": jnp.asarray(vk), "bias": jnp.asarray(vb)},
            "out_proj": {
                "kernel": jnp.asarray(out_proj_kernel(sd["out_proj.weight"], heads)),
                "bias": jnp.asarray(sd["out_proj.bias"].numpy()),
            },
        }
    }
    ours = MultiHeadAttention(d, heads)
    out = ours.apply(
        params,
        jnp.asarray(q.transpose(1, 0, 2)),  # batch-first
        jnp.asarray(kv.transpose(1, 0, 2)),
        jnp.asarray(kv.transpose(1, 0, 2)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(1, 0, 2), ref, rtol=1e-4, atol=1e-5
    )


def _fake_vqvae_state_dict(down_ratio, dim, K, input_dim):
    """Random state_dict with the reference's exact key/shape layout
    (vqvae_model.py:168-216)."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    def add_conv(prefix, o, i, k):
        sd[f"{prefix}.weight"] = t(o, i, k, k)
        sd[f"{prefix}.bias"] = t(o)

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.tensor(
            np.abs(rng.randn(c)).astype(np.float32) + 0.5
        )
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    def add_resblock(prefix, c):
        add_conv(f"{prefix}.block.1", c, c, 3)
        add_bn(f"{prefix}.block.2", c)
        add_conv(f"{prefix}.block.4", c, c, 1)
        add_bn(f"{prefix}.block.5", c)

    if down_ratio == 4:
        add_conv("encoder.0", dim, input_dim, 4)
        add_bn("encoder.1", dim)
        add_conv("encoder.3", dim, dim, 4)
        add_resblock("encoder.4", dim)
        add_resblock("encoder.5", dim)
        add_resblock("decoder.0", dim)
        add_resblock("decoder.1", dim)
        sd["decoder.3.weight"] = t(dim, dim, 4, 4)  # ConvTranspose (I,O,k,k)
        sd["decoder.3.bias"] = t(dim)
        add_bn("decoder.4", dim)
        sd["decoder.6.weight"] = t(dim, input_dim, 4, 4)
        sd["decoder.6.bias"] = t(input_dim)
        sd["codebook.embedding.weight"] = t(K, dim)
    else:
        raise NotImplementedError
    return sd


def test_vqvae_import_structural_roundtrip():
    """Imported tree must exactly match the flax-init tree (paths + shapes),
    and the model must run with it."""
    from mage_tpu.models.vqvae import VectorQuantizedVAE

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=8)
    ref_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=True
    )
    sd = _fake_vqvae_state_dict(4, 16, 8, 1)
    sd = {f"module.{k}": v for k, v in sd.items()}  # DDP prefix handling
    imported = import_vqvae(sd, down_ratio=4)

    ref_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(ref_vars)
    }
    imp_paths = {
        jax.tree_util.keystr(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_leaves_with_path(imported)
    }
    assert ref_paths == imp_paths

    x = jnp.asarray(np.random.RandomState(5).randn(2, 32, 32, 1), jnp.float32)
    imported = jax.tree_util.tree_map(jnp.asarray, imported)
    (x_tilde, _, _), _ = model.apply(imported, x, train=True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(x_tilde)).all()
    # eval mode exercises the imported running stats
    ids = model.apply(imported, x, method="encode", mutable=False)
    assert ids.shape == (2, 8, 8)


def _fake_mage_state_dict(width=64, text_width=64, ma_d=64, text_layers=1,
                          ma_layers=1, dec_layers=3, K=32, L=5, R=4,
                          vocab=30, ctx=12, use_cids=True, randomness=True):
    """Random state_dict with the reference MAGE's exact key layout
    (mage_model.py:446-514)."""
    rng = np.random.RandomState(0)
    sd = {}

    def t(*shape):
        return torch.tensor(rng.randn(*shape).astype(np.float32) * 0.05)

    def add_linear(prefix, o, i):
        sd[f"{prefix}.weight"] = t(o, i)
        sd[f"{prefix}.bias"] = t(o)

    def add_ln(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)

    def add_mha(prefix, d):
        sd[f"{prefix}.in_proj_weight"] = t(3 * d, d)
        sd[f"{prefix}.in_proj_bias"] = t(3 * d)
        add_linear(f"{prefix}.out_proj", d, d)

    def add_mlp(prefix, d):
        add_linear(f"{prefix}.c_fc", 4 * d, d)
        add_linear(f"{prefix}.c_proj", d, 4 * d)

    # text encoder (mage_model.py:180-221)
    sd["text_encoder.token_embedding.weight"] = t(vocab, text_width)
    sd["text_encoder.positions.weight"] = t(ctx, text_width)
    add_ln("text_encoder.layer_norm", text_width)
    add_ln("text_encoder.ln_text_final", text_width)
    add_linear("text_encoder.text_projection", ma_d, text_width)
    for i in range(text_layers):
        p = f"text_encoder.transformer.layers.{i}"
        add_mha(f"{p}.self_attn", text_width)
        add_linear(f"{p}.linear1", 4 * text_width, text_width)
        add_linear(f"{p}.linear2", text_width, 4 * text_width)
        add_ln(f"{p}.norm1", text_width)
        add_ln(f"{p}.norm2", text_width)
    # MA encoder (:104-117) — ln_q/ln_kv exist even when unused (:76-77)
    for i in range(ma_layers):
        p = f"ma_encoder.blocks.{i}"
        add_mha(f"{p}.attn", ma_d)
        add_ln(f"{p}.ln_q", ma_d)
        add_ln(f"{p}.ln_kv", ma_d)
        add_ln(f"{p}.ln_2", ma_d)
        add_mlp(f"{p}.mlp", ma_d)
    # decoder (:317-365)
    add_linear("generate_model.in_linear", ma_d, width)
    add_linear("generate_model.context_linear", ma_d, ma_d)
    sd["generate_model.T_positional_embedding"] = t(L, 1, 1, ma_d)
    for i in range(dec_layers):
        p = f"generate_model.blocks.{i}"
        add_mha(f"{p}.attn", ma_d)
        add_ln(f"{p}.ln_1", ma_d)
        add_ln(f"{p}.ln_2", ma_d)
        add_mlp(f"{p}.mlp", ma_d)
    add_linear("generate_model.out", K, ma_d)
    # top module (:480-512)
    sd["visual_token_embedding.weight"] = t(K, width)
    sd["conv.0.weight"] = t(width, width, 3, 3)
    sd["speed_embedding"] = t(1, width)
    sd["H_positional_embedding"] = t(1, R, 1, width)
    sd["W_positional_embedding"] = t(1, 1, R, width)
    if randomness:
        for i in range(4):
            out = width if i < 3 else ma_d
            inp = width
            p = f"conv3d.{i}"
            sd[f"{p}.conv1.weight"] = t(out, inp, 3, 3, 3)
            add_ln(f"{p}.bn1", out)
            sd[f"{p}.conv2.weight"] = t(out, out, 3, 3, 3)
            add_ln(f"{p}.bn2", out)
            sd[f"{p}.downsample.0.weight"] = t(out, inp, 3, 3, 3)
            add_ln(f"{p}.downsample.1", out)
        def add_conv2d(prefix, o, i, k):
            sd[f"{prefix}.weight"] = t(o, i, k, k)
            sd[f"{prefix}.bias"] = t(o)
        add_conv2d("conv_mu2", 64, width, 3)
        add_conv2d("conv_var2", 64, width, 3)
        sd["conv_d2.weight"] = t(width, 64, 3, 3)
        add_conv2d("adain.conv_mu.0", width, width, 3)
        add_conv2d("adain.conv_mu.1", width, width, 3)
        add_conv2d("adain.conv_var.0", width, width, 3)
        add_conv2d("adain.conv_var.1", width, width, 3)
    return sd


def test_mage_core_import_structural_roundtrip():
    from mage_tpu.compat.torch_import import import_mage_core
    from mage_tpu.models.mage import MAGECore

    core = MAGECore(
        codebook_size=32, frames_length=5, image_resolution=4, vision_width=64,
        use_cids=True, randomness=True, dropout=0.0,
        text_vocab_size=30, text_context_length=12, text_width=64,
        text_layers=1, text_output_dim=64, ma_layers=1, ma_d_model=64,
        dec_layers=3, dec_out_channels=32,
    )
    latents = jnp.zeros((1, 5, 4, 4), jnp.int32)
    text = jnp.zeros((1, 12), jnp.int32)
    speed = jnp.zeros((1,), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent": jax.random.PRNGKey(2)}
    ref = core.init(rngs, latents, text, speed, train=False)["params"]

    sd = _fake_mage_state_dict()
    imported = import_mage_core(
        sd, use_cids=True, randomness=True, vision_width=64, ma_d_model=64,
        text_width=64, text_layers=1, ma_layers=1, dec_layers=3,
    )
    ref_paths = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_leaves_with_path(ref)}
    imp_paths = {jax.tree_util.keystr(p): np.asarray(v).shape
                 for p, v in jax.tree_util.tree_leaves_with_path(imported)}
    assert ref_paths == imp_paths, (
        set(ref_paths) ^ set(imp_paths),
        {k: (ref_paths.get(k), imp_paths.get(k))
         for k in ref_paths if imp_paths.get(k) != ref_paths.get(k)},
    )

    imported = jax.tree_util.tree_map(jnp.asarray, imported)
    out = core.apply(
        {"params": imported}, latents, text, speed, train=False,
        rngs={"latent": jax.random.PRNGKey(3)},
    )
    assert np.isfinite(float(out["prediction"]))
