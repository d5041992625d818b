"""Export mage_tpu parameter trees to reference (PyTorch) state_dicts.

The inverse of :mod:`mage_tpu.compat.torch_import`: weights trained in this
framework load into the reference implementation with
``model.load_state_dict(to_torch(sd))`` (strict for the VQ-VAE; the MAGE
export covers every ``MAGE`` parameter except the frozen
``first_stage_model.*`` subtree, which ``export_mage_core`` can merge in
from the first-stage variables).

Layout transforms are the exact inverses documented in torch_import
(NHWC flax -> NCHW torch, DenseGeneral q/k/v -> packed in_proj, etc.).
Reference key layouts: modules/vqvae_model.py:168-215 (Sequential
indices), modules/mage_model.py:446-514.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def conv2d_weight(kernel) -> np.ndarray:
    """(kH, kW, I, O) -> (O, I, kH, kW)."""
    return _np(kernel).transpose(3, 2, 0, 1)


def conv3d_weight(kernel) -> np.ndarray:
    """(kT, kH, kW, I, O) -> (O, I, kT, kH, kW)."""
    return _np(kernel).transpose(4, 3, 0, 1, 2)


def convtranspose2d_weight(kernel) -> np.ndarray:
    """(kH, kW, O, I) flax transpose_kernel=True -> (I, O, kH, kW)."""
    return _np(kernel).transpose(3, 2, 0, 1)


def linear_weight(kernel) -> np.ndarray:
    """(I, O) -> (O, I)."""
    return _np(kernel).T


def merge_in_proj(q, k, v) -> tuple[np.ndarray, np.ndarray]:
    """Three (D, heads, hd) DenseGeneral kernels (+ (heads, hd) biases) ->
    packed (3D, D) in_proj_weight / (3D,) in_proj_bias."""
    ws, bs = [], []
    for p in (q, k, v):
        kern = _np(p["kernel"])
        d = kern.shape[0]
        ws.append(kern.reshape(d, -1).T)  # (D_out, D_in)
        bs.append(_np(p["bias"]).reshape(-1))
    return np.concatenate(ws, axis=0), np.concatenate(bs, axis=0)


def out_proj_weight(kernel) -> np.ndarray:
    """(heads, hd, D) -> (D, D)."""
    kern = _np(kernel)
    return kern.reshape(-1, kern.shape[-1]).T


def to_torch(sd: Mapping[str, np.ndarray]) -> dict:
    """numpy state_dict -> torch tensors (cpu)."""
    import torch

    # copy: jax array buffers are read-only, torch wants writable memory
    return {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# VQ-VAE
# ---------------------------------------------------------------------------


def _put_conv(sd, prefix, params, kind="conv2d"):
    fn = {"conv2d": conv2d_weight, "conv3d": conv3d_weight,
          "convT": convtranspose2d_weight, "linear": linear_weight}[kind]
    sd[f"{prefix}.weight"] = fn(params["kernel"])
    if "bias" in params:
        sd[f"{prefix}.bias"] = _np(params["bias"])


def _put_bn(sd, prefix, params, stats):
    sd[f"{prefix}.weight"] = _np(params["scale"])
    sd[f"{prefix}.bias"] = _np(params["bias"])
    sd[f"{prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{prefix}.running_var"] = _np(stats["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _put_resblock(sd, prefix, params, stats):
    """Inverse of torch_import._resblock (reference vqvae_model.py:111-124)."""
    _put_conv(sd, f"{prefix}.block.1", params["Conv_0"])
    _put_bn(sd, f"{prefix}.block.2", params["BatchNorm_0"], stats["BatchNorm_0"])
    _put_conv(sd, f"{prefix}.block.4", params["Conv_1"])
    _put_bn(sd, f"{prefix}.block.5", params["BatchNorm_1"], stats["BatchNorm_1"])


def _put_bottleneck(sd, prefix, params, has_id_path):
    """Inverse of torch_import._bottleneck (vqvae_model.py:126-166)."""
    convs = [params[f"Conv_{i}"] for i in range(4 + has_id_path)]
    if has_id_path:
        _put_conv(sd, f"{prefix}.id_path", convs[0])
        convs = convs[1:]
    for conv, t in zip(convs, (1, 3, 5, 7)):
        _put_conv(sd, f"{prefix}.block.{t}", conv)


def export_vqvae(variables: Mapping[str, Any], down_ratio: int = 4) -> dict:
    """{params, batch_stats} -> reference VectorQuantizedVAE state_dict
    (strict-loadable)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    enc, dec = params["encoder"], params["decoder"]
    enc_s = stats.get("encoder", {})
    dec_s = stats.get("decoder", {})
    sd: dict = {"codebook.embedding.weight": _np(params["codebook"])}
    if down_ratio == 4:
        _put_conv(sd, "encoder.0", enc["Conv_0"])
        _put_bn(sd, "encoder.1", enc["BatchNorm_0"], enc_s["BatchNorm_0"])
        _put_conv(sd, "encoder.3", enc["Conv_1"])
        _put_resblock(sd, "encoder.4", enc["ResBlock_0"], enc_s["ResBlock_0"])
        _put_resblock(sd, "encoder.5", enc["ResBlock_1"], enc_s["ResBlock_1"])
        _put_resblock(sd, "decoder.0", dec["ResBlock_0"], dec_s["ResBlock_0"])
        _put_resblock(sd, "decoder.1", dec["ResBlock_1"], dec_s["ResBlock_1"])
        _put_conv(sd, "decoder.3", dec["ConvTranspose_0"], "convT")
        _put_bn(sd, "decoder.4", dec["BatchNorm_0"], dec_s["BatchNorm_0"])
        _put_conv(sd, "decoder.6", dec["ConvTranspose_1"], "convT")
    elif down_ratio == 8:
        _put_conv(sd, "encoder.0", enc["Conv_0"])
        for i, (t, chg) in enumerate(zip((1, 3, 5, 7), (False, False, True, True))):
            _put_bottleneck(sd, f"encoder.{t}", enc[f"EncoderBlock_{i}"], chg)
        for i, (t, chg) in enumerate(zip((0, 2, 4, 6), (True, True, False, False))):
            _put_bottleneck(sd, f"decoder.{t}", dec[f"DecoderBlock_{i}"], chg)
        _put_conv(sd, "decoder.8", dec["Conv_0"])
    else:
        raise ValueError(down_ratio)
    return sd


# ---------------------------------------------------------------------------
# MAGE
# ---------------------------------------------------------------------------


def _put_ln(sd, prefix, params):
    sd[f"{prefix}.weight"] = _np(params["scale"])
    sd[f"{prefix}.bias"] = _np(params["bias"])


def _put_identity_ln(sd, prefix, dim):
    """The reference TransformerBlock always *creates* ln_q/ln_kv but MAGE
    (pre_ln=False) never applies them (mage_model.py:92-93); emit identity
    so strict load succeeds."""
    sd[f"{prefix}.weight"] = np.ones((dim,), np.float32)
    sd[f"{prefix}.bias"] = np.zeros((dim,), np.float32)


def _put_mha(sd, prefix, params):
    w, b = merge_in_proj(params["q_proj"], params["k_proj"], params["v_proj"])
    sd[f"{prefix}.in_proj_weight"] = w
    sd[f"{prefix}.in_proj_bias"] = b
    sd[f"{prefix}.out_proj.weight"] = out_proj_weight(params["out_proj"]["kernel"])
    sd[f"{prefix}.out_proj.bias"] = _np(params["out_proj"]["bias"])


def _put_mlp(sd, prefix, params):
    _put_conv(sd, f"{prefix}.c_fc", params["c_fc"], "linear")
    _put_conv(sd, f"{prefix}.c_proj", params["c_proj"], "linear")


def _put_axial_block(sd, prefix, params):
    _put_mha(sd, f"{prefix}.attn", params["attn"])
    _put_ln(sd, f"{prefix}.ln_1", params["ln_1"])
    _put_ln(sd, f"{prefix}.ln_2", params["ln_2"])
    _put_mlp(sd, f"{prefix}.mlp", params["mlp"])


def _put_cross_block(sd, prefix, params, pre_ln):
    _put_mha(sd, f"{prefix}.attn", params["attn"])
    _put_ln(sd, f"{prefix}.ln_2", params["ln_2"])
    _put_mlp(sd, f"{prefix}.mlp", params["mlp"])
    if pre_ln:
        _put_ln(sd, f"{prefix}.ln_q", params["ln_q"])
        _put_ln(sd, f"{prefix}.ln_kv", params["ln_kv"])
    else:
        dim = _np(params["attn"]["out_proj"]["bias"]).shape[0]
        _put_identity_ln(sd, f"{prefix}.ln_q", dim)
        _put_identity_ln(sd, f"{prefix}.ln_kv", dim)


def _put_basic_block3d(sd, prefix, params):
    sd[f"{prefix}.conv1.weight"] = conv3d_weight(params["conv1"]["kernel"])
    _put_ln(sd, f"{prefix}.bn1", params["bn1"])
    sd[f"{prefix}.conv2.weight"] = conv3d_weight(params["conv2"]["kernel"])
    _put_ln(sd, f"{prefix}.bn2", params["bn2"])
    sd[f"{prefix}.downsample.0.weight"] = conv3d_weight(
        params["downsample_conv"]["kernel"]
    )
    _put_ln(sd, f"{prefix}.downsample.1", params["downsample_norm"])


def export_mage_core(
    params: Mapping[str, Any],
    *,
    use_cids: bool,
    randomness: bool,
    text_layers: int,
    ma_layers: int,
    dec_layers: int,
    pre_ln: bool = False,
    first_stage: Mapping[str, np.ndarray] | None = None,
) -> dict:
    """MAGECore params -> reference MAGE state_dict (mage_model.py:446-514).

    ``first_stage``: an already-exported first-stage state_dict (e.g. from
    :func:`export_vqvae`) to merge under ``first_stage_model.`` so the
    result strict-loads into the full reference module.
    """
    sd: dict = {}

    te = params["text_encoder"]
    sd["text_encoder.token_embedding.weight"] = _np(te["token_embedding"]["embedding"])
    sd["text_encoder.positions.weight"] = _np(te["positions"]["embedding"])
    _put_ln(sd, "text_encoder.layer_norm", te["layer_norm"])
    _put_ln(sd, "text_encoder.ln_text_final", te["ln_text_final"])
    _put_conv(sd, "text_encoder.text_projection", te["text_projection"], "linear")
    for i in range(text_layers):
        p = f"text_encoder.transformer.layers.{i}"
        layer = te[f"layer_{i}"]
        _put_mha(sd, f"{p}.self_attn", layer["self_attn"])
        _put_ln(sd, f"{p}.norm1", layer["norm1"])
        _put_ln(sd, f"{p}.norm2", layer["norm2"])
        _put_conv(sd, f"{p}.linear1", layer["linear1"], "linear")
        _put_conv(sd, f"{p}.linear2", layer["linear2"], "linear")

    for i in range(ma_layers):
        _put_cross_block(
            sd, f"ma_encoder.blocks.{i}", params["ma_encoder"][f"block_{i}"], pre_ln
        )

    gm = params["generate_model"]
    _put_conv(sd, "generate_model.in_linear", gm["in_linear"], "linear")
    _put_conv(sd, "generate_model.context_linear", gm["context_linear"], "linear")
    sd["generate_model.T_positional_embedding"] = _np(gm["T_positional_embedding"])
    for i in range(dec_layers):
        _put_axial_block(sd, f"generate_model.blocks.{i}", gm[f"blocks_{i}"])
    if use_cids:
        _put_conv(sd, "generate_model.out", gm["out"], "linear")
    else:
        _put_ln(sd, "generate_model.out.0", gm["out_norm"])
        kern = _np(gm["out_conv"]["kernel"])  # (I, O) Dense == 1x1x1 conv3d
        sd["generate_model.out.2.weight"] = kern.T[..., None, None, None]
        sd["generate_model.out.2.bias"] = _np(gm["out_conv"]["bias"])

    sd["conv.0.weight"] = conv2d_weight(params["conv"]["kernel"])
    sd["speed_embedding"] = _np(params["speed_embedding"])
    sd["H_positional_embedding"] = _np(params["H_positional_embedding"])[None]
    sd["W_positional_embedding"] = _np(params["W_positional_embedding"])[None]
    if use_cids:
        sd["visual_token_embedding.weight"] = _np(
            params["visual_token_embedding"]["embedding"]
        )
    else:
        _put_conv(sd, "visual_token_embedding", params["visual_token_projection"],
                  "linear")
    if randomness:
        for i in range(4):
            _put_basic_block3d(sd, f"conv3d.{i}", params[f"conv3d_{i}"])
        _put_conv(sd, "conv_mu2", params["conv_mu2"])
        _put_conv(sd, "conv_var2", params["conv_var2"])
        sd["conv_d2.weight"] = conv2d_weight(params["conv_d2"]["kernel"])
        adain = params["adain"]
        _put_conv(sd, "adain.conv_mu.0", adain["conv_mu_0"])
        _put_conv(sd, "adain.conv_mu.1", adain["conv_mu_1"])
        _put_conv(sd, "adain.conv_var.0", adain["conv_var_0"])
        _put_conv(sd, "adain.conv_var.1", adain["conv_var_1"])
    if first_stage is not None:
        for k, v in first_stage.items():
            sd[f"first_stage_model.{k}"] = v
    return sd
