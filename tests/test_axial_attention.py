"""Fused flat-layout axial attention: kernel (interpret) vs the einsum
math, and the block-level opt-in path vs the standard block."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.ops.axial_attention import _axial_pallas, _axial_xla, axial_slot_attention

G, S, D, H = 24, 6, 64, 2


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(G, S, D).astype(np.float32))
                 for _ in range(3))


def test_kernel_matches_einsum():
    q, k, v = _inputs()
    out_k = _axial_pallas(q, k, v, H, tile_g=8, interpret=True)
    out_x = _axial_xla(q, k, v, H)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_kernel_pads_ragged_g():
    q, k, v = _inputs(seed=1)
    out_k = _axial_pallas(q, k, v, H, tile_g=16, interpret=True)  # 24 % 16 != 0
    out_x = _axial_xla(q, k, v, H)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_block_optin_path_matches_standard(monkeypatch):
    from mage_tpu.models.layers import AxialAttentionBlock

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 1, 4, 6, 32).astype(np.float32))  # (B,T,H,W,C)
    block = AxialAttentionBlock(d_model=32, n_head=4, dropout=0.0, axial_dim=2)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    ref = block.apply(variables, x, train=False)
    monkeypatch.setenv("MAGE_SPATIAL_ATTN", "pallas_interpret")
    out = block.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_axial_pallas_partitions_without_gather(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _inputs(seed=3)
    ns = NamedSharding(mesh8, P("data", None, None))
    qs, ks, vs = (jax.device_put(t, ns) for t in (q, k, v))
    fn = jax.jit(
        lambda a, b, c: axial_slot_attention(a, b, c, H, impl="pallas_interpret"),
        in_shardings=(ns, ns, ns), out_shardings=ns,
    )
    out = fn(qs, ks, vs)
    ref = axial_slot_attention(q, k, v, H, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    hlo = fn.lower(qs, ks, vs).compile().as_text()
    for coll in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert coll not in hlo, coll


def test_fused_block_matches_xla_block(monkeypatch):
    """MAGE_SPATIAL_ATTN=fusedblock_interpret: the whole-block Pallas
    kernel (LN1 -> QKV -> attention -> proj -> LN2 -> MLP) must match the
    unfused eval-mode block."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mage_tpu.models.layers import AxialAttentionBlock

    blk = AxialAttentionBlock(d_model=64, n_head=2, dropout=0.1, axial_dim=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 5, 4, 64))
    params = blk.init(rng, x, train=False)
    monkeypatch.setenv("MAGE_SPATIAL_ATTN", "xla")
    ref = blk.apply(params, x, train=False)
    monkeypatch.setenv("MAGE_SPATIAL_ATTN", "fusedblock_interpret")
    fused = blk.apply(params, x, train=False)
    assert fused.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    # regression: Module.init UNDER the fusedblock env var must work —
    # _fused_block_params reads .variables["params"], which doesn't exist
    # during init (the is_initializing() guard falls through to the
    # param-creating path; this KeyError'd the whole bench under
    # MAGE_SPATIAL_ATTN=fusedblock)
    params2 = blk.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(params2) == \
        jax.tree_util.tree_structure(params)
    fused2 = blk.apply(params2, x, train=False)
    np.testing.assert_allclose(
        np.asarray(fused2), np.asarray(fused), rtol=1e-6, atol=1e-6
    )
