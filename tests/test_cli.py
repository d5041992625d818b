"""CLI surface smoke tests (arg parsing + tiny end-to-end runs on CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_vqvae_cli_end_to_end(tmp_path):
    """Generate a micro dataset and run one epoch of the real CLI."""
    from mage_tpu.data.generators.mnist_single import main as gen_main

    gen_main(["--out", str(tmp_path), "--num-train", "16", "--num-val", "8",
              "--seed", "0"])
    import train_vqvae

    train_vqvae.main([
        "--data-root", str(tmp_path) + "/mnist_single_20f_10k_",
        "--dataset", "mnist", "--hidden-size", "16", "--k", "8",
        "--batch-size", "8", "--num-epochs", "1", "--lr", "1e-3",
        "--output-folder", "t", "--log-folder", str(tmp_path / "logs"),
        "--model-folder", str(tmp_path / "models"), "--log-every", "1",
    ])
    assert (tmp_path / "models" / "t" / "best").is_dir()
    assert (tmp_path / "logs" / "t" / "metrics.jsonl").exists()


def test_main_mage_cli_train_and_sample(tmp_path):
    from mage_tpu.data.generators.mnist_single import main as gen_main

    gen_main(["--out", str(tmp_path), "--num-train", "16", "--num-val", "8",
              "--seed", "1"])
    cfg = f"""
train: {{epoch: 1, batchsize: 8, lr: 1e-3, cos: true, checkpoint_every: 2}}
model:
  target: mage_tpu.models.pipeline.MagePipeline
  params:
    codebook_size: 8
    frames_length: 4
    image_resolution: 16
    vision_width: 32
    dropout: 0.1
    use_cids: true
    randomness: false
    first_stage_config:
      target: mage_tpu.models.vqvae.VectorQuantizedVAE
      params: {{input_dim: 1, dim: 16, down_ratio: 4, K: 8}}
    text_encoder_config:
      target: mage_tpu.models.layers.TransformerTextEncoder
      params: {{vocab_size: 30, context_length: 16, transformer_width: 32,
               transformer_layers: 1, output_dim: 32, padding_idx: 0, dropout: 0.1}}
    ma_config:
      target: mage_tpu.models.layers.MAEncoder
      params: {{layers: 1, d_model: 32}}
    generate_decoder_config:
      target: mage_tpu.models.mage.FlatAxialDecoder
      params: {{in_channels: 32, out_channels: 8, model_channels: 32,
               frames_length: 4, layers: 3}}
data:
  target: mage_tpu.data.datasets.MovingMnist
  params:
    data_root: '{tmp_path}/mnist_single_20f_10k_'
    frames_length: 4
    sample_speed: [1.0, 2.0]
    context_length: 16
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)
    import main_mage

    ckpt_dir = tmp_path / "ckpt"
    main_mage.main([
        "--config", str(cfg_path), "--split", "train",
        "--checkpoint-path", str(ckpt_dir),
    ])
    assert (ckpt_dir / "model_best").is_dir()
    assert (ckpt_dir / "config.yaml").exists()

    main_mage.main([
        "--split", "test", "--test_model", str(ckpt_dir / "model_best"),
        "--max-test-items", "1", "--n_samples", "1",
    ])
    gifs = list((ckpt_dir / "videos").glob("*.gif"))
    assert len(gifs) == 1


def test_bench_importable():
    import bench

    p = bench.build_pipeline(frames_length=4)
    assert p.frames_length == 4
    assert p.core.frames_length == 4


def test_graft_entry_shapes():
    import __graft_entry__ as ge

    p = ge._tiny_pipeline()
    batch = ge._batch(p, 2, 32, 32, 1)
    assert batch["images"].shape == (2, 4, 32, 32, 1)
