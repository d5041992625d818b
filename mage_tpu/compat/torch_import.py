"""Import reference (PyTorch) checkpoints into mage_tpu parameter trees.

Lets a user of the reference implementation bring their trained weights
(`.pt`/`.pth` state_dicts saved by train_vqvae.py:177-182 /
main_mage.py:189-199, possibly with a DDP ``module.`` prefix) straight into
this framework.

Layout transforms (NCHW torch -> NHWC flax):
- Conv2d weight (O, I, kH, kW)        -> kernel (kH, kW, I, O)
- Conv3d weight (O, I, kT, kH, kW)    -> kernel (kT, kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW) -> kernel (kH, kW, O, I) with
  flax ``transpose_kernel=True`` semantics (gradient-of-conv, identical to
  torch's); the VQ-VAE decoder uses ``padding=((2,2),(2,2))`` transposed
  convs to match torch's k4 s2 p1 geometry exactly.
- Linear weight (O, I) -> kernel (I, O)
- nn.MultiheadAttention packed in_proj_weight (3D, D) -> split q/k/v
  DenseGeneral kernels (D, heads, head_dim); out_proj (D, D) ->
  (heads, head_dim, D). (SURVEY.md §7 hard-part 6.)
- BatchNorm: weight/bias -> scale/bias; running stats -> batch_stats.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def strip_ddp_prefix(sd: Mapping[str, Any]) -> dict:
    """Drop the DDP 'module.' prefix (reference main_mage.py:218-223)."""
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return dict(sd)


def conv2d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def conv3d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 4, 1, 0)


def convtranspose2d_kernel(w) -> np.ndarray:
    """(I, O, kH, kW) -> (kH, kW, O, I) for transpose_kernel=True."""
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


def split_in_proj(w, b, n_head: int):
    """Packed (3D, D) in_proj -> three (D, heads, hd) kernels + biases."""
    w = _np(w)
    b = _np(b)
    d = w.shape[1]
    hd = d // n_head
    outs = []
    for i in range(3):
        wk = w[i * d : (i + 1) * d]  # (D_out, D_in)
        bk = b[i * d : (i + 1) * d]
        outs.append(
            (wk.T.reshape(d, n_head, hd), bk.reshape(n_head, hd))
        )
    return outs  # [(q_k, q_b), (k_k, k_b), (v_k, v_b)]


def out_proj_kernel(w, n_head: int) -> np.ndarray:
    """(D, D) torch out_proj -> (heads, hd, D)."""
    w = _np(w)
    d = w.shape[1]
    hd = d // n_head
    return w.T.reshape(n_head, hd, d)


def _bn(sd, prefix):
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]),
         "var": _np(sd[f"{prefix}.running_var"])},
    )


def _conv(sd, prefix, kind="conv2d"):
    fn = {"conv2d": conv2d_kernel, "conv3d": conv3d_kernel,
          "convT": convtranspose2d_kernel, "linear": linear_kernel}[kind]
    out = {"kernel": fn(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _resblock(sd, prefix):
    """Reference ResBlock (vqvae_model.py:111-124): block.1 conv3x3,
    block.2 BN, block.4 conv1x1, block.5 BN."""
    p0, s0 = _bn(sd, f"{prefix}.block.2")
    p1, s1 = _bn(sd, f"{prefix}.block.5")
    params = {
        "Conv_0": _conv(sd, f"{prefix}.block.1"),
        "BatchNorm_0": p0,
        "Conv_1": _conv(sd, f"{prefix}.block.4"),
        "BatchNorm_1": p1,
    }
    stats = {"BatchNorm_0": s0, "BatchNorm_1": s1}
    return params, stats


def _bottleneck(sd, prefix, has_id_path):
    """Reference EncoderBlock/DecoderBlock (vqvae_model.py:126-166):
    block.{1,3,5,7} convs, id_path conv when dims change."""
    params = {}
    for i, t in enumerate((1, 3, 5, 7)):
        params[f"Conv_{i}"] = _conv(sd, f"{prefix}.block.{t}")
    if has_id_path:
        # flax creates the id-path conv first in __call__
        params = {"Conv_0": _conv(sd, f"{prefix}.id_path"),
                  **{f"Conv_{i+1}": params[f"Conv_{i}"] for i in range(4)}}
    return params


def import_vqvae(sd: Mapping[str, Any], down_ratio: int = 4) -> dict:
    """Reference VectorQuantizedVAE state_dict -> {params, batch_stats}."""
    sd = strip_ddp_prefix(sd)
    if down_ratio == 4:
        enc_r0_p, enc_r0_s = _resblock(sd, "encoder.4")
        enc_r1_p, enc_r1_s = _resblock(sd, "encoder.5")
        bn0_p, bn0_s = _bn(sd, "encoder.1")
        encoder = {
            "Conv_0": _conv(sd, "encoder.0"),
            "BatchNorm_0": bn0_p,
            "Conv_1": _conv(sd, "encoder.3"),
            "ResBlock_0": enc_r0_p,
            "ResBlock_1": enc_r1_p,
        }
        encoder_stats = {
            "BatchNorm_0": bn0_s,
            "ResBlock_0": enc_r0_s,
            "ResBlock_1": enc_r1_s,
        }
        dec_r0_p, dec_r0_s = _resblock(sd, "decoder.0")
        dec_r1_p, dec_r1_s = _resblock(sd, "decoder.1")
        dbn_p, dbn_s = _bn(sd, "decoder.4")
        decoder = {
            "ResBlock_0": dec_r0_p,
            "ResBlock_1": dec_r1_p,
            "ConvTranspose_0": _conv(sd, "decoder.3", "convT"),
            "BatchNorm_0": dbn_p,
            "ConvTranspose_1": _conv(sd, "decoder.6", "convT"),
        }
        decoder_stats = {
            "ResBlock_0": dec_r0_s,
            "ResBlock_1": dec_r1_s,
            "BatchNorm_0": dbn_s,
        }
    elif down_ratio == 8:
        # encoder: conv stem 0, EncoderBlocks at 1,3,5,7 (MaxPool between)
        encoder = {"Conv_0": _conv(sd, "encoder.0")}
        dims_change = [False, False, True, True]
        for i, (t, chg) in enumerate(zip((1, 3, 5, 7), dims_change)):
            encoder[f"EncoderBlock_{i}"] = _bottleneck(sd, f"encoder.{t}", chg)
        encoder_stats = {}
        # decoder: DecoderBlocks at 0,2,4,6 (+ final conv at 8)
        decoder = {}
        dims_change = [True, True, False, False]
        for i, (t, chg) in enumerate(zip((0, 2, 4, 6), dims_change)):
            decoder[f"DecoderBlock_{i}"] = _bottleneck(sd, f"decoder.{t}", chg)
        decoder["Conv_0"] = _conv(sd, "decoder.8")
        decoder_stats = {}
    else:
        raise ValueError(down_ratio)

    params = {
        "encoder": encoder,
        "decoder": decoder,
        "codebook": _np(sd["codebook.embedding.weight"]),
    }
    batch_stats = {}
    if encoder_stats:
        batch_stats["encoder"] = encoder_stats
    if decoder_stats:
        batch_stats["decoder"] = decoder_stats
    return {"params": params, "batch_stats": batch_stats}


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch .pt/.pth file on CPU without importing CUDA."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return strip_ddp_prefix(obj)


# ---------------------------------------------------------------------------
# Stage-2 (MAGE) import
# ---------------------------------------------------------------------------


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _gn(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _mha(sd, prefix, n_head):
    (qk, qb), (kk, kb), (vk, vb) = split_in_proj(
        sd[f"{prefix}.in_proj_weight"], sd[f"{prefix}.in_proj_bias"], n_head
    )
    return {
        "q_proj": {"kernel": qk, "bias": qb},
        "k_proj": {"kernel": kk, "bias": kb},
        "v_proj": {"kernel": vk, "bias": vb},
        "out_proj": {
            "kernel": out_proj_kernel(sd[f"{prefix}.out_proj.weight"], n_head),
            "bias": _np(sd[f"{prefix}.out_proj.bias"]),
        },
    }


def _mlp(sd, prefix):
    return {
        "c_fc": _conv(sd, f"{prefix}.c_fc", "linear"),
        "c_proj": _conv(sd, f"{prefix}.c_proj", "linear"),
    }


def _axial_block(sd, prefix, n_head):
    return {
        "attn": _mha(sd, f"{prefix}.attn", n_head),
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def _cross_block(sd, prefix, n_head, pre_ln):
    """Reference TransformerBlock (mage_model.py:72-95). ln_q/ln_kv exist in
    the state_dict even for MAGE (unused, :92); imported only for MAGE+."""
    out = {
        "attn": _mha(sd, f"{prefix}.attn", n_head),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }
    if pre_ln:
        out["ln_q"] = _ln(sd, f"{prefix}.ln_q")
        out["ln_kv"] = _ln(sd, f"{prefix}.ln_kv")
    return out


def _basic_block3d(sd, prefix):
    """Reference BasicBlock (mage_model.py:264-297) with downsample."""
    return {
        "conv1": {"kernel": conv3d_kernel(sd[f"{prefix}.conv1.weight"])},
        "bn1": _gn(sd, f"{prefix}.bn1"),
        "conv2": {"kernel": conv3d_kernel(sd[f"{prefix}.conv2.weight"])},
        "bn2": _gn(sd, f"{prefix}.bn2"),
        "downsample_conv": {
            "kernel": conv3d_kernel(sd[f"{prefix}.downsample.0.weight"])
        },
        "downsample_norm": _gn(sd, f"{prefix}.downsample.1"),
    }


def import_mage_core(
    sd: Mapping[str, Any],
    *,
    use_cids: bool,
    randomness: bool,
    vision_width: int,
    ma_d_model: int,
    text_width: int,
    text_layers: int,
    ma_layers: int,
    dec_layers: int,
    pre_ln: bool = False,
) -> dict:
    """Reference MAGE state_dict (mage_model.py:446-514) -> MAGECore params.
    ``first_stage_model.*`` entries are ignored (load the first stage with
    import_vqvae / its own path)."""
    sd = strip_ddp_prefix(sd)
    heads_v = vision_width // 32
    heads_t = text_width // 32
    heads_m = ma_d_model // 32

    text_encoder = {
        "token_embedding": {"embedding": _np(sd["text_encoder.token_embedding.weight"])},
        "positions": {"embedding": _np(sd["text_encoder.positions.weight"])},
        "layer_norm": _ln(sd, "text_encoder.layer_norm"),
        "ln_text_final": _ln(sd, "text_encoder.ln_text_final"),
        "text_projection": _conv(sd, "text_encoder.text_projection", "linear"),
    }
    for i in range(text_layers):
        p = f"text_encoder.transformer.layers.{i}"
        text_encoder[f"layer_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn", heads_t),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "linear1": _conv(sd, f"{p}.linear1", "linear"),
            "linear2": _conv(sd, f"{p}.linear2", "linear"),
        }

    ma_encoder = {
        f"block_{i}": _cross_block(sd, f"ma_encoder.blocks.{i}", heads_m, pre_ln)
        for i in range(ma_layers)
    }

    generate_model = {
        "in_linear": _conv(sd, "generate_model.in_linear", "linear"),
        "context_linear": _conv(sd, "generate_model.context_linear", "linear"),
        "T_positional_embedding": _np(sd["generate_model.T_positional_embedding"]),
    }
    for i in range(dec_layers):
        generate_model[f"blocks_{i}"] = _axial_block(
            sd, f"generate_model.blocks.{i}", ma_d_model // 32
        )
    if use_cids:
        generate_model["out"] = _conv(sd, "generate_model.out", "linear")
    else:
        generate_model["out_norm"] = _gn(sd, "generate_model.out.0")
        # 1x1x1 conv3d head == Dense: (O, I, 1, 1, 1) -> (I, O)
        w = _np(sd["generate_model.out.2.weight"])
        generate_model["out_conv"] = {
            "kernel": w.reshape(w.shape[0], w.shape[1]).T,
            "bias": _np(sd["generate_model.out.2.bias"]),
        }

    params = {
        "text_encoder": text_encoder,
        "ma_encoder": ma_encoder,
        "generate_model": generate_model,
        "conv": {"kernel": conv2d_kernel(sd["conv.0.weight"])},
        "speed_embedding": _np(sd["speed_embedding"]),
        # (1, R, 1, C) -> (R, 1, C); (1, 1, R, C) -> (1, R, C)
        "H_positional_embedding": _np(sd["H_positional_embedding"])[0],
        "W_positional_embedding": _np(sd["W_positional_embedding"])[0],
    }
    if use_cids:
        params["visual_token_embedding"] = {
            "embedding": _np(sd["visual_token_embedding.weight"])
        }
    else:
        params["visual_token_projection"] = _conv(sd, "visual_token_embedding", "linear")
    if randomness:
        for i in range(4):
            params[f"conv3d_{i}"] = _basic_block3d(sd, f"conv3d.{i}")
        params["conv_mu2"] = _conv(sd, "conv_mu2")
        params["conv_var2"] = _conv(sd, "conv_var2")
        params["conv_d2"] = {"kernel": conv2d_kernel(sd["conv_d2.weight"])}
        params["adain"] = {
            "conv_mu_0": _conv(sd, "adain.conv_mu.0"),
            "conv_mu_1": _conv(sd, "adain.conv_mu.1"),
            "conv_var_0": _conv(sd, "adain.conv_var.0"),
            "conv_var_1": _conv(sd, "adain.conv_var.1"),
        }
    return params
