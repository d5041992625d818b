"""Convert reference PyTorch checkpoints to mage_tpu orbax checkpoints.

Usage:
    # stage-1 VQ-VAE (reference train_vqvae.py output, e.g. caterv1.pt)
    python -m mage_tpu.compat.convert vqvae --input caterv1.pt \
        --down-ratio 8 --output models/autoencoders/vqvae_f8_cater/caterv1

    # stage-2 MAGE (reference main_mage.py output, e.g. model_best.pth)
    python -m mage_tpu.compat.convert mage --input model_best.pth \
        --config config/mage_caterv1.yaml --output results/imported
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

    args = p.parse_args(argv)

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

    from mage_tpu.config import load_config

    cfg = load_config(args.config).model.params
    te = cfg.text_encoder_config.params
    ma = cfg.ma_config.params
    dec = cfg.generate_decoder_config.params
    params = import_mage_core(
        sd,
        use_cids=bool(cfg.get("use_cids", False)),
        randomness=bool(cfg.get("randomness", False)),
        vision_width=int(cfg.vision_width),
        ma_d_model=int(ma.d_model),
        text_width=int(te.transformer_width),
        text_layers=int(te.transformer_layers),
        ma_layers=int(ma.layers),
        dec_layers=int(dec.layers),
        pre_ln=not bool(cfg.get("use_cids", False)),
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    # wrap as a restorable train-state-shaped tree (params only)
    tree = {"step": jnp.zeros((), jnp.int32), "params": params}
    ckpt.save(name, tree)
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"imported {n:,} stage-2 params -> {args.output}")


if __name__ == "__main__":
    main()
