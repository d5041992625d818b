"""Integration: the reference's ACTUAL CATER input format end-to-end.

VERDICT r3 missing #4: every CATER run so far used the synthetic compact
form; the real-data path — an AVI+scenes tree consumed by the caption
generator (reference data/gen_cater_text_anno.py) and decoded per-item
with a video reader (reference dataload.py:274-380, decord) — was never
exercised e2e. This test builds a cv2-encoded fixture tree, generates the
{split}_{mode}.json annotations with the real CLI, loads batches through
``datasets.CATER`` + ``data.video.VideoReader``, runs one jitted train
step, and samples one AR generation.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mage_tpu.config import instantiate_from_config, loads_config
from mage_tpu.data import transforms as T
from mage_tpu.data.datasets import CATER
from mage_tpu.data.generators import cater_text_anno
from mage_tpu.data.loader import Loader

N_FRAMES_STORED = 24
RES = 64  # stored AVI resolution; transform resizes to 32 for speed


def _write_scene(data_dir, name, action, shape, color, final_pos,
                 obj2=None):
    """One CATER scenes/*.json + its videos/*.avi (reference tree layout:
    gen_cater_text_anno.py derives the AVI path from the scene path)."""
    objects = [{
        "instance": f"{shape}_0",
        "shape": shape,
        "size": "small",
        "color": color,
        "material": "rubber",
        "locations": {
            str(i): [final_pos[0] * i / (N_FRAMES_STORED - 1),
                     final_pos[1] * i / (N_FRAMES_STORED - 1), 0.0]
            for i in range(N_FRAMES_STORED)
        },
    }]
    movements = {f"{shape}_0": [[action, obj2, 0, N_FRAMES_STORED - 1]]}
    if obj2 is not None:
        objects.append({
            "instance": obj2,
            "shape": obj2.split("_")[0].lower(),
            "size": "medium",
            "color": "blue",
            "material": "metal",
            "locations": {"0": [0.5, 0.5, 0.0]},
        })
        movements[obj2] = []
    os.makedirs(os.path.join(data_dir, "scenes"), exist_ok=True)
    os.makedirs(os.path.join(data_dir, "videos"), exist_ok=True)
    with open(os.path.join(data_dir, "scenes", f"{name}.json"), "w") as fp:
        json.dump({"movements": movements, "objects": objects}, fp)

    writer = cv2.VideoWriter(
        os.path.join(data_dir, "videos", f"{name}.avi"),
        cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (RES, RES),
    )
    assert writer.isOpened(), "cv2 cannot open an MJPG AVI writer"
    rng = np.random.RandomState(hash(name) % 2**31)
    base = rng.randint(0, 80, (RES, RES, 3), np.uint8)
    for t in range(N_FRAMES_STORED):
        frame = base.copy()
        x = 4 + 2 * t
        frame[20:36, x : x + 16] = (0, 0, 255)  # moving red square (BGR)
        writer.write(frame)
    writer.release()


@pytest.fixture(scope="module")
def avi_tree(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("cater_avi"))
    _write_scene(td, "CATER_new_000001", "_slide", "cube", "red", (1.2, -0.7))
    _write_scene(td, "CATER_new_000002", "_rotate", "cone", "green", (0, 0))
    _write_scene(td, "CATER_new_000003", "_pick_place", "sphere", "purple",
                 (-0.9, 1.4))
    _write_scene(td, "CATER_new_000004", "_contain", "cone", "yellow",
                 (0.3, 0.4), obj2="Sphere_1")
    # the real annotation CLI (checks AVI decodability like the
    # reference's ffprobe guard, writes train/test_{mode}.json)
    cater_text_anno.main(["--data-dir", td, "--mode", "explicit",
                          "--dataset", "CATER-GEN-v2", "--seed", "42"])
    return td


def test_generator_wrote_annotations(avi_tree):
    with open(os.path.join(avi_tree, "train_explicit.json")) as fp:
        train = json.load(fp)
    with open(os.path.join(avi_tree, "test_explicit.json")) as fp:
        test = json.load(fp)
    assert len(train) + len(test) == 4 and len(train) >= len(test)
    rec = train["0"]
    assert rec["video"].startswith("videos/") and rec["caption"].strip()


def test_broken_avi_skipped(avi_tree, tmp_path):
    # a scenes entry whose AVI is missing must be dropped (reference
    # gen_cater_text_anno.py:23-44 probes and skips broken renders)
    td = str(tmp_path / "broken")
    _write_scene(td, "CATER_new_000001", "_slide", "cube", "red", (1, 1))
    _write_scene(td, "CATER_new_000002", "_rotate", "cone", "green", (0, 0))
    os.remove(os.path.join(td, "videos", "CATER_new_000002.avi"))
    cater_text_anno.main(["--data-dir", td, "--mode", "explicit",
                          "--dataset", "CATER-GEN-v2", "--seed", "0"])
    n = 0
    for split in ("train", "test"):
        with open(os.path.join(td, f"{split}_explicit.json")) as fp:
            n += len(json.load(fp))
    assert n == 1


def test_dataset_train_step_and_sampling(avi_tree):
    import jax

    frames_length = 4
    transform = T.Compose(
        [T.Resize(32), T.ToFloat(), T.Normalize([0.5], [0.5])]
    )
    ds = CATER(
        dataset="caterv2", data_root=avi_tree, split="train",
        frames_length=frames_length, sample_speed=[1.0, 2.0],
        context_length=38, image_transform=transform,
    )
    assert len(ds) >= 2
    item = ds[0]
    assert item["images"].shape == (frames_length, 32, 32, 3)
    # Normalize(.5,.5): [0,1] -> [-1,1] (the reference CATER transform)
    assert item["images"].min() >= -1.0 - 1e-6
    assert item["images"].max() <= 1.0 + 1e-6
    assert item["text"].shape == (38,)
    # the caption round-trips through the v2 vocab (no <unk> except pads)
    decoded = ds.decode(item["text"])
    assert "the" in decoded

    cfg = loads_config(
        """
train: {epoch: 1, batchsize: 2, lr: 1e-3, checkpoint_every: 4}
model:
  target: mage_tpu.models.pipeline.MagePipeline
  params:
    codebook_size: 32
    frames_length: 4
    image_resolution: 8
    vision_width: 64
    use_cids: true
    first_stage_config:
      target: mage_tpu.models.vqvae.VectorQuantizedVAE
      params: {input_dim: 3, dim: 16, down_ratio: 4, K: 32}
    text_encoder_config:
      target: mage_tpu.models.layers.TransformerTextEncoder
      params:
        vocab_size: 64
        context_length: 38
        transformer_width: 64
        transformer_layers: 1
        output_dim: 64
        padding_idx: 0
    ma_config:
      target: mage_tpu.models.layers.MAEncoder
      params: {layers: 1, d_model: 64}
    generate_decoder_config:
      target: mage_tpu.models.mage.FlatAxialDecoder
      params:
        in_channels: 64
        out_channels: 32
        model_channels: 64
        frames_length: 4
        layers: 3
"""
    )
    pipeline = instantiate_from_config(cfg.model)
    from mage_tpu.training.mage_trainer import MageTrainer

    loader = Loader(ds, 2, shuffle=False, drop_last=True)
    batch = next(iter(loader))
    import tempfile

    from mage_tpu.parallel import make_mesh

    # 4 fixture videos -> batch 2: use a single-device mesh (the conftest
    # forces 8 virtual devices and batch must divide the data axis)
    mesh1 = make_mesh({"data": 1}, devices=jax.devices()[:1])
    with tempfile.TemporaryDirectory() as ckpt_dir:
        trainer = MageTrainer(pipeline, cfg.train, ckpt_dir, mesh=mesh1)
        trainer.init_state(batch)
        state, terms = trainer.train_step(
            trainer.state, trainer.fs_vars, trainer._prep(batch), 1e-3,
            trainer.beta, pipeline.alpha, jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(terms["final_loss"]))

    # AR sampling on the same real-data batch (the original trainer.state
    # was donated to the train step — use the returned state)
    video = pipeline.generate(
        state.params, trainer._prep(batch), jax.random.PRNGKey(1),
        fs_variables=trainer.fs_vars, cached=True,
    )
    assert video.shape == (2, frames_length, 32, 32, 3)
    # frame 0 is the ground-truth first frame (reference mage_model.py:691)
    np.testing.assert_allclose(
        np.asarray(video[:, 0]), np.asarray(batch["images"][:, 0]), atol=1e-5
    )
