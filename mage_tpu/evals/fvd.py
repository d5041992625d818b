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


def resolve_extractor(dataset: str | None = None, batch_size: int = 8):
    """Best available FVD feature extractor, in order of preference:

    1. a Kinetics pytorch-i3d checkpoint (``MAGE_I3D_TORCH``, the
       standard FVD extractor) — absent in offline images;
    2. an action-trained trunk from ``train_fvd_extractor.py``
       (``MAGE_FVD_EXTRACTOR``, default ``runs/fvd_extractor``) whose
       provenance ``dataset`` family matches ``dataset``;
    3. the documented random-init Mixed_3c fallback (see I3D docstring).

    Returns ``(extract_fn, provenance_str, feature_dim)``. All three
    satisfy the ``compute_fvd`` extractor contract; the provenance string
    is recorded next to every FVD so readers know which regime a number
    came from (VERDICT r3 weak #8: mixed extractors made cross-run FVDs
    incomparable).
    """
    import json
    import os

    torch_ckpt = os.environ.get("MAGE_I3D_TORCH", "")
    if torch_ckpt and os.path.exists(torch_ckpt):
        import torch

        from mage_tpu.evals.i3d import import_i3d_torch, make_extractor

        variables = import_i3d_torch(torch.load(torch_ckpt,
                                                map_location="cpu"))
        return (make_extractor(variables, batch_size=batch_size,
                               endpoint="logits"),
                f"pytorch-i3d {os.path.basename(torch_ckpt)} (Kinetics), "
                f"endpoint logits", 400)

    env_path = os.environ.get("MAGE_FVD_EXTRACTOR")
    candidates = ([env_path] if env_path
                  else ["runs/fvd_extractor", "runs/fvd_extractor_mnist"])
    for path in candidates:
        prov_path = os.path.join(path, "provenance.json")
        if not (os.path.exists(prov_path) and dataset is not None):
            if env_path:  # explicit request must fail loudly, not fall
                raise FileNotFoundError(
                    f"MAGE_FVD_EXTRACTOR={env_path}: provenance.json missing "
                    f"(or dataset=None at the call site) — refusing to fall "
                    f"back to the random-init extractor the caller "
                    f"explicitly asked to avoid")
            continue
        with open(prov_path) as fp:
            trained_on = json.load(fp).get("dataset", "")
        # v1/v2 share the visual world; an extractor trained on either
        # CATER family member transfers to the other
        if trained_on.split("-")[0] != str(dataset).split("-")[0]:
            if env_path:
                raise ValueError(
                    f"MAGE_FVD_EXTRACTOR={env_path}: trained on "
                    f"'{trained_on}' but the eval dataset is '{dataset}' — "
                    f"refusing the family mismatch; unset the env var to "
                    f"allow auto-discovery/random-init")
            continue
        try:
            from mage_tpu.evals.i3d import load_trained_extractor

            return load_trained_extractor(path, batch_size=batch_size)
        except FileNotFoundError:
            if env_path:
                raise
            continue

    import jax
    import jax.numpy as jnp

    from mage_tpu.evals.i3d import I3D, make_extractor

    i3d = I3D(num_classes=400, endpoint="Mixed_3c")
    variables = jax.jit(lambda: i3d.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 2, 32, 32, 3)), train=False
    ))()
    return (make_extractor(variables, batch_size=batch_size,
                           endpoint="Mixed_3c"),
            "random-init seed 42, endpoint Mixed_3c (deep random features "
            "mean-field-collapse; shallow random projections discriminate "
            "— see I3D docstring)", 480)
