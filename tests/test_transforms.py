import random

import numpy as np

from mage_tpu.data import transforms as T
from mage_tpu.data.loader import Loader, PrefetchLoader


def _clip(t=4, h=32, w=48, c=3, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (t, h, w, c), dtype=np.uint8)


def test_resize_shorter_side_and_exact():
    clip = _clip()
    assert T.Resize(16)(clip).shape == (4, 16, 24, 3)
    assert T.Resize((20, 30))(clip).shape == (4, 20, 30, 3)


def test_crops_and_flips():
    clip = _clip()
    assert T.CenterCrop(24)(clip).shape == (4, 24, 24, 3)
    rng = random.Random(0)
    assert T.RandomCrop(16)(clip, rng).shape == (4, 16, 16, 3)
    assert T.RandomResizedCrop(20, scale=(0.5, 1.0))(clip, rng).shape == (4, 20, 20, 3)
    flipped = T.RandomHorizontalFlip()(clip, random.Random(1))
    assert flipped.shape == clip.shape


def test_tofloat_normalize_pipeline():
    pipe = T.Compose([T.ToFloat(), T.Normalize([0.5], [0.5])])
    out = pipe(_clip(), random.Random(0))
    assert out.dtype == np.float32
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_color_and_blur_transforms():
    clip = _clip()
    rng = random.Random(0)
    assert T.ColorJitter(0.4, 0.4, 0.4)(clip, rng).shape == clip.shape
    gray = T.RandomGrayscale(p=1.0)(clip, rng)
    np.testing.assert_array_equal(gray[..., 0], gray[..., 1])
    assert T.GaussianBlur()(clip, rng).shape == clip.shape
    inv = T.ColorInversion()(clip)
    np.testing.assert_array_equal(inv, 255 - clip)
    rot = T.RandomRotation(15)(clip, rng)
    assert rot.shape == clip.shape


def test_prefetch_loader_matches_plain():
    data = [np.full((2, 2), i) for i in range(20)]
    plain = Loader(data, 4, shuffle=True, seed=3)
    pre = PrefetchLoader(Loader(data, 4, shuffle=True, seed=3), depth=2)
    plain.set_epoch(1)
    pre.set_epoch(1)
    a = list(plain)
    b = list(pre)
    assert len(a) == len(b) == 5
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
