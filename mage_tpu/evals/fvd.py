"""FVD (Frechet Video Distance) harness.

The reference repo does not compute FVD (SURVEY.md §4/§6 — the paper's FVD
tables are produced outside the repo). This harness provides the full
pipeline around the feature extractor: batched feature extraction, Gaussian
statistics, and the Frechet distance. The standard extractor is an I3D
network pretrained on Kinetics; no such checkpoint ships in offline
environments, so the extractor is injected:

    fvd = compute_fvd(real_videos, gen_videos, extractor=my_i3d_fn)

``extractor``: callable (N, T, H, W, 3) uint8/float -> (N, D) features.

The standard extractor itself ships in ``mage_tpu.evals.i3d``: the I3D
architecture in flax plus a pytorch-i3d checkpoint importer —
``make_extractor(import_i3d_torch(torch.load("rgb_imagenet.pt")))``.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from mage_tpu.evals.metrics import frechet_distance, gaussian_stats


def extract_features(
    videos: Iterable[np.ndarray],
    extractor: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 16,
) -> np.ndarray:
    videos = np.asarray(videos)
    feats = []
    for start in range(0, len(videos), batch_size):
        feats.append(np.asarray(extractor(videos[start : start + batch_size])))
    return np.concatenate(feats, axis=0)


def compute_fvd(
    real_videos: np.ndarray,
    gen_videos: np.ndarray,
    extractor: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 16,
) -> float:
    real = extract_features(real_videos, extractor, batch_size)
    gen = extract_features(gen_videos, extractor, batch_size)
    return frechet_distance(*gaussian_stats(real), *gaussian_stats(gen))


def fvd_same_split_floor(
    real_videos: np.ndarray,
    extractor: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 16,
    seed: int = 0,
) -> float:
    """Split-half FVD of the REAL set against itself — the sampling-noise
    floor of the metric at this sample count and extractor.

    Calibration line for every recorded FVD (VERDICT r3 weak #8): with a
    random-init extractor the absolute scale is arbitrary, so readers
    need the same-distribution floor next to each number; an FVD within
    ~1-2x the floor is indistinguishable from real, and the
    gen-over-floor ratio is comparable across runs in a way raw values
    are not."""
    videos = np.asarray(real_videos)
    idx = np.random.RandomState(seed).permutation(len(videos))
    half = len(videos) // 2
    a = extract_features(videos[idx[:half]], extractor, batch_size)
    b = extract_features(videos[idx[half : 2 * half]], extractor, batch_size)
    return frechet_distance(*gaussian_stats(a), *gaussian_stats(b))
