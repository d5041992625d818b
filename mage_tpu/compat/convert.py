"""Convert checkpoints between the reference (PyTorch) and mage_tpu (orbax)
formats — both directions.

Usage:
    # stage-1 VQ-VAE (reference train_vqvae.py output, e.g. caterv1.pt)
    python -m mage_tpu.compat.convert vqvae --input caterv1.pt \
        --down-ratio 8 --output models/autoencoders/vqvae_f8_cater/caterv1

    # stage-2 MAGE (reference main_mage.py output, e.g. model_best.pth)
    python -m mage_tpu.compat.convert mage --input model_best.pth \
        --config config/mage_caterv1.yaml --output results/imported

    # back to torch (strict-loadable by the reference modules)
    python -m mage_tpu.compat.convert export-vqvae --input <orbax ckpt> \
        --down-ratio 8 --output caterv1_exported.pt
    python -m mage_tpu.compat.convert export-mage --input <orbax ckpt> \
        --config config/mage_caterv1.yaml \
        [--first-stage <orbax vqvae ckpt>] --output model_exported.pth
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="kind", required=True)

    pv = sub.add_parser("vqvae")
    pv.add_argument("--input", required=True)
    pv.add_argument("--down-ratio", type=int, default=8, choices=[4, 8])
    pv.add_argument("--output", required=True)

    pm = sub.add_parser("mage")
    pm.add_argument("--input", required=True)
    pm.add_argument("--config", required=True, help="mage_tpu YAML config")
    pm.add_argument("--output", required=True)

    pev = sub.add_parser("export-vqvae")
    pev.add_argument("--input", required=True, help="orbax checkpoint path")
    pev.add_argument("--down-ratio", type=int, default=8, choices=[4, 8])
    pev.add_argument("--output", required=True, help=".pt file")

    pem = sub.add_parser("export-mage")
    pem.add_argument("--input", required=True, help="orbax checkpoint path")
    pem.add_argument("--config", required=True, help="mage_tpu YAML config")
    pem.add_argument("--first-stage", default="",
                     help="orbax VQ-VAE checkpoint to merge as first_stage_model.*")
    pem.add_argument("--first-stage-down-ratio", type=int, default=8, choices=[4, 8])
    pem.add_argument("--output", required=True, help=".pth file")

    args = p.parse_args(argv)

    if args.kind in ("export-vqvae", "export-mage"):
        return _export(args)

    import os

    import jax.numpy as jnp
    import jax

    from mage_tpu.compat.torch_import import (
        import_mage_core,
        import_vqvae,
        load_torch_checkpoint,
    )
    from mage_tpu.training.checkpoint import Checkpointer

    sd = load_torch_checkpoint(args.input)
    out_dir, name = os.path.split(os.path.abspath(args.output))
    ckpt = Checkpointer(out_dir)

    if args.kind == "vqvae":
        tree = import_vqvae(sd, down_ratio=args.down_ratio)
        tree = jax.tree_util.tree_map(jnp.asarray, tree)
        ckpt.save(name, tree)
        n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
        print(f"imported {n:,} values -> {args.output}")
        return

    dims = _mage_dims(args.config)
    params = import_mage_core(
        sd,
        use_cids=dims["use_cids"],
        randomness=dims["randomness"],
        vision_width=dims["vision_width"],
        ma_d_model=dims["ma_d_model"],
        text_width=dims["text_width"],
        text_layers=dims["text_layers"],
        ma_layers=dims["ma_layers"],
        dec_layers=dims["dec_layers"],
        pre_ln=dims["pre_ln"],
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # wrap as a restorable train-state-shaped tree (params only)
    tree = {"step": jnp.zeros((), jnp.int32), "params": params}
    ckpt.save(name, tree)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"imported {n:,} stage-2 params -> {args.output}")


def _restore(path: str) -> dict:
    import os

    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def _mage_dims(config_path: str) -> dict:
    """The MAGECore dims/flags both conversion directions derive from a
    mage_tpu YAML config (single source for the pre_ln = MAGE+ rule)."""
    from mage_tpu.config import load_config

    cfg = load_config(config_path).model.params
    te = cfg.text_encoder_config.params
    ma = cfg.ma_config.params
    dec = cfg.generate_decoder_config.params
    use_cids = bool(cfg.get("use_cids", False))
    return dict(
        use_cids=use_cids,
        randomness=bool(cfg.get("randomness", False)),
        vision_width=int(cfg.vision_width),
        ma_d_model=int(ma.d_model),
        text_width=int(te.transformer_width),
        text_layers=int(te.transformer_layers),
        ma_layers=int(ma.layers),
        dec_layers=int(dec.layers),
        # the reference switches the cross-attn LN placement by variant
        # (mage_model.py:92-93): MAGE+ (continuous) is pre-LN
        pre_ln=not use_cids,
    )


def _export(args):
    import torch

    from mage_tpu.compat.torch_export import (
        export_mage_core,
        export_vqvae,
        to_torch,
    )

    restored = _restore(args.input)
    if args.kind == "export-vqvae":
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
        }
        sd = to_torch(export_vqvae(variables, down_ratio=args.down_ratio))
    else:
        dims = _mage_dims(args.config)
        first_stage = None
        if args.first_stage:
            fs = _restore(args.first_stage)
            first_stage = export_vqvae(
                {"params": fs["params"],
                 "batch_stats": fs.get("batch_stats", {})},
                down_ratio=args.first_stage_down_ratio,
            )
        sd = to_torch(
            export_mage_core(
                restored["params"],
                use_cids=dims["use_cids"],
                randomness=dims["randomness"],
                text_layers=dims["text_layers"],
                ma_layers=dims["ma_layers"],
                dec_layers=dims["dec_layers"],
                pre_ln=dims["pre_ln"],
                first_stage=first_stage,
            )
        )
    torch.save(sd, args.output)
    print(f"exported {len(sd)} tensors -> {args.output}")



if __name__ == "__main__":
    main()
