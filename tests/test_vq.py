"""VQ op tests: Pallas kernel vs XLA math, straight-through gradient parity
with the reference's autograd semantics (modules/vqvae_model.py:6-65),
cross-checked against an independent torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.ops import codebook_lookup, nearest_codebook_indices, vq_straight_through
from mage_tpu.ops.vq import _vq_xla


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(*shape) * scale).astype(np.float32)


def test_indices_match_bruteforce():
    z = jnp.asarray(_rand((7, 3, 16), 1))
    cb = jnp.asarray(_rand((32, 16), 2))
    idx = nearest_codebook_indices(z, cb, impl="xla")
    # brute force
    d = np.linalg.norm(z.reshape(-1, 16)[:, None, :] - np.asarray(cb)[None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), d.argmin(1))


def test_pallas_interpret_matches_xla():
    z = jnp.asarray(_rand((300, 32), 3))  # non-multiple of tile to test padding
    cb = jnp.asarray(_rand((64, 32), 4))
    idx_p = nearest_codebook_indices(z, cb, impl="pallas_interpret")
    idx_x = nearest_codebook_indices(z, cb, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_tie_breaking_first_index():
    cb = jnp.asarray(np.stack([np.ones(8), np.ones(8), np.zeros(8)]).astype(np.float32))
    z = jnp.ones((4, 8), jnp.float32)
    idx = nearest_codebook_indices(z, cb, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx), np.zeros(4))  # rows 0,1 tie -> 0
    idx_p = nearest_codebook_indices(z, cb, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(idx_p), np.zeros(4))


def test_straight_through_forward_is_exact_codes():
    z = jnp.asarray(_rand((5, 4, 8), 5))
    cb = jnp.asarray(_rand((16, 8), 6))
    codes, idx = vq_straight_through(z, cb, "xla")
    np.testing.assert_array_equal(
        np.asarray(codes), np.asarray(cb)[np.asarray(idx)]
    )


def test_straight_through_gradients_analytic():
    """dL/dz must be the unchanged output cotangent; dL/dcodebook must be
    the index_add scatter of that cotangent (reference :48-65)."""
    z = jnp.asarray(_rand((6, 8), 7))
    cb = jnp.asarray(_rand((10, 8), 8))
    w = jnp.asarray(_rand((6, 8), 9))  # arbitrary cotangent shaping

    def loss(z, cb):
        codes, _ = vq_straight_through(z, cb, "xla")
        return jnp.sum(codes * w)

    gz, gcb = jax.grad(loss, argnums=(0, 1))(z, cb)
    np.testing.assert_allclose(np.asarray(gz), np.asarray(w), rtol=1e-6)
    idx = np.asarray(nearest_codebook_indices(z, cb, impl="xla"))
    expected = np.zeros((10, 8), np.float32)
    np.add.at(expected, idx, np.asarray(w))
    np.testing.assert_allclose(np.asarray(gcb), expected, rtol=1e-6)


def test_detached_codebook_gets_no_grad():
    """Callers reproduce the reference's ``codebook.detach()``
    (modules/vqvae_model.py:100) with stop_gradient."""
    z = jnp.asarray(_rand((6, 8), 10))
    cb = jnp.asarray(_rand((10, 8), 11))

    def loss(cb):
        codes, _ = vq_straight_through(z, jax.lax.stop_gradient(cb), "xla")
        return jnp.sum(codes**2)

    gcb = jax.grad(loss)(cb)
    np.testing.assert_array_equal(np.asarray(gcb), np.zeros((10, 8)))


def test_codebook_lookup_methods_agree_and_grad():
    cb = jnp.asarray(_rand((12, 8), 12))
    idx = jnp.asarray(np.random.RandomState(13).randint(0, 12, size=(4, 5)))
    a = codebook_lookup(cb, idx, method="gather")
    b = codebook_lookup(cb, idx, method="onehot")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    g1 = jax.grad(lambda c: jnp.sum(codebook_lookup(c, idx, method="gather") ** 2))(cb)
    g2 = jax.grad(lambda c: jnp.sum(codebook_lookup(c, idx, method="onehot") ** 2))(cb)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_parity_with_torch_reference_semantics():
    """Independent torch reimplementation of the reference's straight-through
    autograd (identity grad to inputs + index_add to codebook) must agree
    with our custom_vjp on values and gradients."""
    torch = pytest.importorskip("torch")

    z_np = _rand((9, 8), 14)
    cb_np = _rand((16, 8), 15)

    zt = torch.tensor(z_np, requires_grad=True)
    cbt = torch.tensor(cb_np, requires_grad=True)
    with torch.no_grad():
        dist = (cbt**2).sum(1)[None, :] - 2.0 * (zt @ cbt.t()) + (zt**2).sum(1)[:, None]
        idx_t = dist.argmin(1)
    codes_t = zt + (cbt[idx_t] - zt).detach()  # straight-through to z
    bar_t = cbt[idx_t]  # attached codebook branch (index_add grad)
    loss_t = (codes_t**2).sum() + 3.0 * (bar_t**2).sum()
    loss_t.backward()

    z = jnp.asarray(z_np)
    cb = jnp.asarray(cb_np)

    def loss(z, cb):
        codes, idx = vq_straight_through(z, jax.lax.stop_gradient(cb), "xla")
        bar = codebook_lookup(cb, idx)
        return jnp.sum(codes**2) + 3.0 * jnp.sum(bar**2)

    l = loss(z, cb)
    gz, gcb = jax.grad(loss, argnums=(0, 1))(z, cb)
    np.testing.assert_allclose(float(l), float(loss_t.detach()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gz), zt.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gcb), cbt.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_vq_pallas_partitions_without_gather(mesh8):
    """Batch-sharded tokens through the Pallas VQ must split row-parallel:
    identical ids/codes to the replicated run, no collectives in the HLO."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mage_tpu.ops.vq import _nearest_with_codes

    rng = np.random.RandomState(11)
    z = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    cb = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    ns = NamedSharding(mesh8, P("data", None))
    rs = NamedSharding(mesh8, P(None, None))
    zs = jax.device_put(z, ns)
    cbs = jax.device_put(cb, rs)

    fn = jax.jit(
        lambda a, b: _nearest_with_codes(a, b, impl="pallas_interpret"),
        in_shardings=(ns, rs),
    )
    idx_s, codes_s = fn(zs, cbs)
    idx_r, codes_r = _nearest_with_codes(z, cb, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(codes_s), np.asarray(codes_r),
                               rtol=1e-5, atol=1e-6)
    hlo = fn.lower(zs, cbs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, coll
