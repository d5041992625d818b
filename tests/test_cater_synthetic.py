"""Synthetic CATER stand-in: renderer invariants, device-compose
exactness, and the full disk chain (videos/*.avi + scenes/*.json ->
annotation generator -> CATER dataset -> eval parser round trip).

The real CATER-GEN sets are Blender renders (reference README.md:29-37,
unavailable offline); the stand-in exercises the same component contracts
end to end (reference chain: data/gen_cater_text_anno.py ->
dataload.py::CATER -> eval_precision.py).
"""

import json

import numpy as np
import pytest

from mage_tpu.data.generators import cater_synthetic as cs


def test_sprites_nonempty_and_rotation_visible():
    for shape in cs.SHAPES:
        s0 = cs.draw_sprite(shape, 16, "red", "rubber", phase=0)
        assert s0.shape == (cs.SPRITE, cs.SPRITE, 4)
        assert (s0[..., 3] > 0).sum() > 30  # a real silhouette
        s3 = cs.draw_sprite(shape, 16, "red", "rubber", phase=3)
        # the orientation notch makes rotation visible on every shape
        assert (s0[..., :3] != s3[..., :3]).any()
    metal = cs.draw_sprite("sphere", 16, "blue", "metal")
    rubber = cs.draw_sprite("sphere", 16, "blue", "rubber")
    assert (metal[..., :3].astype(int) - rubber[..., :3].astype(int)).max() > 30


def test_sample_scene_schema_and_actions():
    rng = np.random.RandomState(0)
    seen_actions = set()
    for _ in range(40):
        scene = cs.sample_scene(rng)
        names = {o["instance"] for o in scene["objects"]}
        assert set(scene["movements"]) == names
        assert set(scene["tracks"]) == names
        assert sorted(scene["order"]) == sorted(names)
        movers = {n: m for n, m in scene["movements"].items() if m}
        assert len(movers) == 2
        by_name = {o["instance"]: o for o in scene["objects"]}
        for name, items in movers.items():
            action, target, start, end = items[0]
            seen_actions.add(action)
            assert 0 <= start < end <= cs.T_STORE
            if action == "_contain":
                assert by_name[name]["shape"] == "cone"
                assert target in names and target != name
                # cone ends on the target -> cone drawn after it
                assert (scene["order"].index(name)
                        > scene["order"].index(target))
            else:
                assert target is None
            locs = by_name[name]["locations"]
            assert set(locs) == {"0", "1"}
            if action == "_rotate":
                assert locs["0"] == locs["1"]
                assert scene["tracks"][name]["phase"].max() > 0
        for o in scene["objects"]:
            if o["shape"] == "spl":
                assert (o["size"], o["color"], o["material"]) == (
                    "small", "gold", "metal")
    assert seen_actions == {"_slide", "_rotate", "_pick_place", "_contain"}


def test_device_compose_matches_host_render():
    import jax.numpy as jnp

    from mage_tpu.data import device_data as dd

    compact = cs.build_compact_cater(3, 1, seed=1)
    bank = compact["bank"]
    bg = compact["background"]
    tr = compact["train"]
    # device compose on a handful of (video, frame) pairs
    picks = [(0, 0), (1, 5), (2, cs.T_STORE - 1)]
    sid = np.stack([tr["sid"][v, t] for v, t in picks])
    top = np.stack([tr["top"][v, t] for v, t in picks])
    left = np.stack([tr["left"][v, t] for v, t in picks])
    dev = np.asarray(dd.compose_frames_cater(
        jnp.asarray(bank, jnp.float32), jnp.asarray(bg, jnp.float32),
        jnp.asarray(sid), jnp.asarray(top), jnp.asarray(left),
    ))
    for k, (v, t) in enumerate(picks):
        host = cs.render_frame(bank, bg, tr["sid"][v, t], tr["top"][v, t],
                               tr["left"][v, t])
        np.testing.assert_array_equal(dev[k].astype(np.uint8), host)


def test_compact_captions_parse_and_tokenize():
    from mage_tpu.evals.precision import sen_parse

    compact = cs.build_compact_cater(6, 2, seed=3)
    assert compact["train"]["text"].shape == (6, 38)
    for rec in compact["train"]["meta"]:
        movers = {n: m for n, m in rec["movements"].items() if m}
        parsed = sen_parse(rec["caption"], mode="explicit")
        got = sorted(p["motion"] for p in parsed)
        want = sorted(
            {"_slide": "slide", "_rotate": "rotate",
             "_pick_place": "pick-place", "_contain": "pick-contain"}[
                 m[0][0]] for m in movers.values()
        )
        assert got == want


def test_compact_caterv1_shapes_and_vocab():
    """CATER-GEN-v1 scenes are exactly {cone, snitch} and every caption
    token falls inside the 30-token shape-only vocabulary
    (config/mage_caterv1.yaml vocab_size 30; reference data convention,
    dataload.py CATER vocab split)."""
    from mage_tpu.data.tokenizers import CATERV1_VOCAB, word_tokenize

    compact = cs.build_compact_cater(8, 2, seed=5, dataset="CATER-GEN-v1",
                                     context_length=32)
    assert compact["train"]["text"].shape == (8, 32)
    assert int(compact["train"]["text"].max()) < len(CATERV1_VOCAB)
    for rec in compact["train"]["meta"]:
        shapes = sorted(o["shape"] for o in rec["objects"])
        assert shapes == ["cone", "spl"]
        assert all(t in CATERV1_VOCAB for t in word_tokenize(rec["caption"]))


def test_disk_chain_anno_dataset_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from mage_tpu.data.datasets import CATER
    from mage_tpu.data.generators.cater_text_anno import main as anno_main

    root = tmp_path / "CATER-SYN"
    cs.write_dataset(str(root), num_videos=6, seed=0)
    files = sorted((root / "videos").glob("*.avi"))
    assert len(files) == 6

    anno_main(["--data-dir", str(root), "--mode", "explicit",
               "--dataset", "CATER-GEN-v2", "--max-videos", "6"])
    train = json.loads((root / "train_explicit.json").read_text())
    assert len(train) >= 4  # 80/20 of 6 (video check passed on real files)

    ds = CATER(dataset="caterv2", data_root=str(root), split="train",
               frames_length=10, sample_speed=[1.0, 2.0], randomness=False)
    item = ds[0]
    assert item["images"].shape == (10, 128, 128, 3)
    assert item["images"].min() >= -1.0 and item["images"].max() <= 1.0
    assert item["text"].shape == (38,)
    # decoded caption survives the vocabulary round trip
    text = ds.decode([t for t in item["text"] if t > 2])
    assert "is" in text and "." in text


def test_vqvae_store_builder(tmp_path):
    """cater_vqvae_store flattens the anno'd videos into the per-image
    stage-1 store CATER4VQVAE reads (the prep step the reference leaves
    external, dataload.py:384-400 note at :391)."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from mage_tpu.data.datasets import CATER4VQVAE
    from mage_tpu.data.generators.cater_text_anno import main as anno_main
    from mage_tpu.data.generators.cater_vqvae_store import build_store

    root = tmp_path / "CATER-SYN"
    cs.write_dataset(str(root), num_videos=5, seed=1)
    anno_main(["--data-dir", str(root), "--mode", "explicit",
               "--dataset", "CATER-GEN-v2", "--max-videos", "5"])
    n = build_store(str(root), "train", "explicit", stride=8)
    assert n >= 3 * (cs.T_STORE // 8)  # >= 3 train videos, 3 frames each

    ds = CATER4VQVAE(str(root) + "/", "train")
    assert len(ds) == n
    img = ds[0]
    assert img.shape == (128, 128, 3)
    assert img.min() >= -0.5 and img.max() <= 0.5
