import numpy as np
import pytest

from mage_tpu.data import RecordReader, RecordWriter
from mage_tpu.data.datasets import (
    MovingMnist,
    MovingMnist4VQVAE,
    speed_subsample_indices,
)
from mage_tpu.data.generators import mnist_common as mc
from mage_tpu.data.generators.mnist_single import generate_split, write_records
from mage_tpu.data.loader import Loader
from mage_tpu.data.tokenizers import (
    CATERV2_VOCAB,
    MNIST_VOCAB,
    VocabTokenizer,
    word_tokenize,
)


def test_recordio_roundtrip(tmp_path):
    p = tmp_path / "x.mrs"
    with RecordWriter(p) as w:
        for i in range(5):
            w.append_pickle({"i": i, "a": np.arange(i + 1)})
    r = RecordReader(p)
    assert len(r) == 5
    assert r[3]["i"] == 3
    np.testing.assert_array_equal(r[4]["a"], np.arange(5))
    # picklable / worker-safe reopen
    import pickle

    r2 = pickle.loads(pickle.dumps(r))
    assert r2[2]["i"] == 2


def test_recordio_rejects_garbage(tmp_path):
    p = tmp_path / "bad.mrs"
    p.write_bytes(b"not a record store at all....")
    with pytest.raises(ValueError):
        RecordReader(p)


def test_tokenizer_mnist_roundtrip():
    tok = VocabTokenizer(MNIST_VOCAB, "whitespace")
    ids = tok.encode("the digit 3 is moving up then down .")
    assert ids[0] == 1 and ids[-1] == 2  # CLS/SEP
    assert tok.decode(ids) == "[CLS] the digit 3 is moving up then down . [SEP]"
    padded = tok.encode_padded("the digit 3 is moving up then down .", 32)
    assert padded.shape == (32,) and padded[len(ids):].max() == 0


def test_word_tokenize_cater_grammar():
    s = "the small gold snitch is sliding to ( 1 , -2 ) ."
    toks = word_tokenize(s)
    assert toks == ["the", "small", "gold", "snitch", "is", "sliding", "to",
                    "(", "1", ",", "-2", ")", "."]
    tok = VocabTokenizer(CATERV2_VOCAB, "regex")
    ids = tok.encode(s)
    assert ids.shape[0] == len(toks) + 2


def test_speed_subsample_matches_reference_formula():
    # speed=0 -> interval=lo; round(F/interval) frames
    idx = speed_subsample_indices(20, [1.0, 4.0], 0.0, 1.0)
    ref = np.floor(np.linspace(0, 19, round(20 / 1.0), endpoint=True)).astype(np.int32)
    np.testing.assert_array_equal(idx, ref)
    idx2 = speed_subsample_indices(20, [1.0, 4.0], 0.999, 1.0)
    assert len(idx2) == round(20 / (0.999 * 3 + 1))


def test_bounce_trajectory_bounds_and_motion():
    rng = np.random.RandomState(0)
    ys, xs = mc.bounce_trajectory(20, rng, motion=0, direction=1)
    assert ys.min() >= 0 and ys.max() <= mc.CANVAS
    assert np.all(xs == xs[0])  # vertical motion: x frozen
    ys2, xs2 = mc.bounce_trajectory(20, rng, motion=1, direction=0)
    assert np.all(ys2 == ys2[0])


def test_generator_and_datasets(tmp_path):
    rng = np.random.RandomState(0)
    images, labels = mc.load_digit_bank(None, samples_per_digit=3, seed=0)
    assert images.shape[1:] == (28, 28) and set(labels.tolist()) == set(range(10))
    train_codes, val_codes = mc.digit_motion_split(rng)
    # disjoint (digit, motion) pairs between splits
    assert not set(train_codes.tolist()) & set(val_codes.tolist())
    inst = generate_split(rng, train_codes, images, labels, 12)
    assert len(inst) == 12
    video, caption = inst[0]
    assert video.shape == (20, 64, 64) and video.dtype == np.uint8
    assert caption.startswith("the digit ") and caption.endswith(".")

    root = str(tmp_path) + "/mm_"
    write_records(inst, root + "train.mrs")
    write_records(inst[:4], root + "test.mrs")

    ds = MovingMnist(root, "train", frames_length=10, sample_speed=[1.0, 4.0],
                     context_length=16, seed=1)
    item = ds[0]
    assert item["images"].shape == (10, 64, 64, 1)
    assert item["images"].dtype == np.float32
    assert -0.5 <= item["images"].min() and item["images"].max() <= 0.5
    assert item["text"].shape == (16,)
    assert 0.0 <= item["speed"] < 1.0

    vds = MovingMnist4VQVAE(root, "train", seed=1)
    frame = vds[0]
    assert frame.shape == (64, 64, 1)

    loader = Loader(ds, batch_size=4, shuffle=True, seed=0, drop_last=True)
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 10, 64, 64, 1)
    assert batch["text"].shape == (4, 16)
    assert batch["speed"].shape == (4,)
    # deterministic epoch shuffling
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader.set_epoch(0)
    b1 = next(iter(loader))
    np.testing.assert_array_equal(b0["text"], b1["text"])


def test_loader_sharding():
    data = list(range(100))
    l0 = Loader(data, 10, shuffle=False, num_shards=4, shard_index=0)
    l3 = Loader(data, 10, shuffle=False, num_shards=4, shard_index=3)
    b0 = next(iter(l0))
    b3 = next(iter(l3))
    assert set(np.asarray(b0)) .isdisjoint(set(np.asarray(b3)))
    assert len(l0) == 3  # 25 items, bs 10, no drop -> 3
