"""I3D extractor: architecture structure, forward shape, and the
pytorch-i3d state_dict import path (synthetic weights with the exact
checkpoint naming; no pretrained nets ship in this environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.evals.i3d import I3D, _INCEPTIONS, import_i3d_torch, make_extractor


def _synthetic_state_dict(num_classes=400, seed=0):
    """Numpy stand-in for torch.load('rgb_imagenet.pt'): every key the
    piergiaj/pytorch-i3d I3D emits, torch-shaped (O, I, T, H, W)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def unit(name, cin, cout, k=(1, 1, 1), bn=True, bias=False):
        sd[f"{name}.conv3d.weight"] = rng.randn(cout, cin, *k).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.conv3d.bias"] = rng.randn(cout).astype(np.float32) * 0.05
        if bn:
            sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
            sd[f"{name}.bn.num_batches_tracked"] = np.int64(0)

    unit("Conv3d_1a_7x7", 3, 64, (7, 7, 7))
    unit("Conv3d_2b_1x1", 64, 64)
    unit("Conv3d_2c_3x3", 64, 192, (3, 3, 3))
    cin = 192
    for name, (b0, b1a, b1b, b2a, b2b, b3b) in _INCEPTIONS.items():
        unit(f"{name}.b0", cin, b0)
        unit(f"{name}.b1a", cin, b1a)
        unit(f"{name}.b1b", b1a, b1b, (3, 3, 3))
        unit(f"{name}.b2a", cin, b2a)
        unit(f"{name}.b2b", b2a, b2b, (3, 3, 3))
        unit(f"{name}.b3b", cin, b3b)
        cin = b0 + b1b + b2b + b3b
    unit("logits", cin, num_classes, bn=False, bias=True)
    return sd


def test_i3d_import_and_forward():
    sd = _synthetic_state_dict()
    variables = import_i3d_torch(sd)
    # imported tree must match the flax-initialized structure exactly
    x = jnp.zeros((1, 9, 64, 64, 3), jnp.float32)
    ref = I3D().init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.shape, variables)
    ) == jax.tree_util.tree_structure(jax.tree_util.tree_map(jnp.shape, ref))
    for (pa, va), (pb, vb) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(ref),
               key=lambda kv: jax.tree_util.keystr(kv[0])),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert va.shape == vb.shape, (jax.tree_util.keystr(pa), va.shape, vb.shape)

    out = I3D().apply(variables, jnp.asarray(
        np.random.RandomState(1).randn(2, 9, 64, 64, 3), jnp.float32))
    assert out.shape == (2, 400)
    assert np.isfinite(np.asarray(out)).all()


def test_random_init_shallow_endpoint_discriminates():
    """With RANDOM weights the full 11-stage stack mean-field-collapses
    (every video maps to nearly the same logits vector), making the
    offline FVD fallback meaningless; the shallow Mixed_3c endpoint keeps
    enough input variance that different video distributions separate.
    Pins the fix for the offline extractor (exact-0.0 FVDs in e2e runs)."""
    import jax
    from mage_tpu.evals.fvd import compute_fvd

    def clips(moving, seed, n=8):
        r = np.random.RandomState(seed)
        v = np.full((n, 5, 32, 32, 3), -1.0, np.float32)
        for i in range(n):
            y0, x0 = r.randint(2, 20, 2)
            for t in range(5):
                y = y0 + (3 * t if moving else 0)
                v[i, t, y % 26:(y % 26) + 6, x0:x0 + 6] = 1.0
        return v

    shallow = I3D(endpoint="Mixed_3c")
    iv = jax.jit(lambda: shallow.init(
        jax.random.PRNGKey(42), jnp.zeros((1, 5, 32, 32, 3)),
        train=False))()
    ex = make_extractor(iv, batch_size=4, endpoint="Mixed_3c")
    feats = ex(clips(True, seed=1))
    assert feats.shape == (8, 480)
    assert float(np.std(feats, axis=0).mean()) > 1e-4  # not collapsed
    same = compute_fvd(clips(True, 1), clips(True, 2), ex, batch_size=4)
    diff = compute_fvd(clips(True, 1), clips(False, 3), ex, batch_size=4)
    assert diff > 3.0 * same


def test_i3d_fvd_end_to_end():
    """compute_fvd with the real I3D wiring: FVD(x, x) == 0 and
    FVD(x, y) > 0 for distribution-shifted y."""
    from mage_tpu.evals.fvd import compute_fvd

    variables = import_i3d_torch(_synthetic_state_dict(seed=2))
    extractor = make_extractor(variables)
    rng = np.random.RandomState(3)
    real = (rng.rand(6, 9, 32, 32, 3) * 255).astype(np.uint8)
    shifted = np.clip(real.astype(np.int32) + 64, 0, 255).astype(np.uint8)
    same = compute_fvd(real, real, extractor, batch_size=4)
    diff = compute_fvd(real, shifted, extractor, batch_size=4)
    assert abs(same) < 1e-3
    assert diff > same
