"""Vector-quantization ops: fused nearest-neighbor Pallas kernel + exact
straight-through gradients.

Reference semantics (reference: modules/vqvae_model.py:6-68):

- ``VectorQuantization`` computes squared-L2 nearest codebook ids via
  ``addmm`` distances + argmin and is non-differentiable (:14-25).
- ``VectorQuantizationStraightThrough`` forwards the looked-up codes and
  backpropagates the output gradient *unchanged* to the encoder inputs,
  plus an ``index_add_`` scatter of the gradient into selected codebook
  rows (:48-65).

TPU-native design: the only compute-heavy piece is the distance+argmin,
which maps onto the MXU as a ``(N, D) @ (D, K)`` matmul followed by a VPU
row-argmin — implemented below as a single Pallas kernel that never
materializes the (N, K) distance matrix in HBM. The gradient plumbing
needs no hand-written kernels: a ``jax.custom_vjp`` reproduces the
reference's straight-through + index_add exactly (the scatter-add is the
transpose of gather, which XLA lowers natively).

Note ``argmin`` ties resolve to the *first* minimal index, matching
``torch.min(dim=1)``.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled builds; interpret mode needs pl only
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Pallas kernel: fused distance + argmin (+ code lookup via one-hot matmul)
# ---------------------------------------------------------------------------


def _vq_kernel(z_ref, cb_ref, cbsq_ref, idx_ref, codes_ref):
    """One grid step: a (TN, D) tile of tokens against the full (K, D)
    codebook. ``dist = |e|^2 - 2 z.e`` (the |z|^2 term is constant per row
    and cannot change the argmin). Codes come back via a one-hot matmul —
    an MXU op — instead of a gather.

    All intermediates stay 2-D: 1-D shapes (and jnp.argmin) trigger Mosaic
    register-spill blowups on v5e. Argmin = min + iota-select; ties resolve
    to the smallest column id, matching torch.min(dim=1) in the reference
    (vqvae_model.py:21)."""
    z = z_ref[:].astype(jnp.float32)
    cb = cb_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        z,
        cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TN, K)
    dist = cbsq_ref[:] - 2.0 * scores  # (1, K) broadcast
    k = cb.shape[0]
    mins = jnp.min(dist, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    idx2 = jnp.min(jnp.where(dist == mins, cols, k), axis=1, keepdims=True)
    idx_ref[:] = idx2
    onehot = (cols == idx2).astype(jnp.float32)
    # Mosaic requires 32-bit matmul accumulators; cast down afterwards
    codes_ref[:] = jax.lax.dot_general(
        onehot,
        cb,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(codes_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _vq_pallas(z_flat: jax.Array, codebook: jax.Array, tile_n: int = 512, interpret: bool = False):
    n, d = z_flat.shape
    k = codebook.shape[0]
    n_pad = _round_up(max(n, 8), tile_n)
    z_p = jnp.pad(z_flat, ((0, n_pad - n), (0, 0)))
    cbsq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, K)
    grid = (n_pad // tile_n,)
    idx, codes = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
            pl.BlockSpec((k, d), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), codebook.dtype),
        ],
        interpret=interpret,
    )(z_p, codebook, cbsq)
    return idx[:n, 0], codes[:n]


@functools.lru_cache(maxsize=None)
def _sharded_vq(interpret: bool):
    """GSPMD/shardy-partitionable wrapper for the VQ kernel: tokens (N, D)
    split row-parallel, the codebook replicated, no collectives — without
    this, a batch-sharded jitted train step would all-gather every
    device's tokens around the un-partitionable pallas custom call (see
    the matching pattern in ops/cached_attention.py::_sharded_attn)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def vq(z_flat, codebook):
        return _vq_pallas(z_flat, codebook, interpret=interpret)

    def _n_axis(arg_shapes):
        zs = getattr(arg_shapes[0].sharding, "spec", None)
        if zs and len(zs) > 0:
            return zs[0]
        return None

    def infer(mesh, arg_shapes, result_shape):
        n = _n_axis(arg_shapes)
        return (NamedSharding(mesh, P(n)), NamedSharding(mesh, P(n, None)))

    def partition(mesh, arg_shapes, result_shape):
        n = _n_axis(arg_shapes)
        arg_shardings = (
            NamedSharding(mesh, P(n, None)),
            NamedSharding(mesh, P(None, None)),
        )
        out_shardings = (NamedSharding(mesh, P(n)), NamedSharding(mesh, P(n, None)))

        def lower(z_flat, codebook):
            return _vq_pallas(z_flat, codebook, interpret=interpret)

        return mesh, lower, out_shardings, arg_shardings

    vq.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule="i d, k d -> i, i d",
    )
    return vq


def _vq_xla(z_flat: jax.Array, codebook: jax.Array):
    """XLA fallback (also the reference math: vqvae_model.py:14-25)."""
    z = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    dist = jnp.sum(cb * cb, axis=1)[None, :] - 2.0 * (z @ cb.T)
    idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    return idx, jnp.take(codebook, idx, axis=0)


def _use_pallas_default() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def nearest_codebook_indices(
    z: jax.Array,
    codebook: jax.Array,
    *,
    impl: Literal["auto", "pallas", "xla", "pallas_interpret"] = "auto",
) -> jax.Array:
    """Nearest-neighbor codebook ids for ``z``: (..., D) -> (...,) int32.

    Equivalent of the reference's ``vq`` (modules/vqvae_model.py:6-32);
    non-differentiable by construction (int output).
    """
    idx, _ = _nearest_with_codes(z, codebook, impl=impl)
    return idx


def _nearest_with_codes(z, codebook, *, impl="auto"):
    batch_shape = z.shape[:-1]
    d = z.shape[-1]
    z_flat = z.reshape(-1, d)
    if impl == "auto":
        impl = "pallas" if _use_pallas_default() else "xla"
    if impl == "pallas_raw":  # escape hatch: skip custom_partitioning
        idx, codes = _vq_pallas(z_flat, codebook)
    elif impl in ("pallas", "pallas_interpret"):
        # single-device: skip custom_partitioning (its Python partition
        # callbacks break remote/AOT compile services; nothing to split)
        if jax.device_count() > 1:
            idx, codes = _sharded_vq(impl == "pallas_interpret")(z_flat, codebook)
        else:
            idx, codes = _vq_pallas(
                z_flat, codebook, interpret=impl == "pallas_interpret"
            )
    else:
        idx, codes = _vq_xla(z_flat, codebook)
    return idx.reshape(batch_shape), codes.reshape(*batch_shape, d)


# ---------------------------------------------------------------------------
# Straight-through estimator with index_add codebook gradient
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def vq_straight_through(z: jax.Array, codebook: jax.Array, impl: str = "auto"):
    """Quantize with straight-through gradients.

    Forward: ``codes = codebook[argmin_dist(z)]`` (bit-exact codes, not the
    ``z + sg(codes - z)`` approximation). Backward: the cotangent of
    ``codes`` flows unchanged into ``z`` and is scatter-added into the
    selected ``codebook`` rows — exactly the reference's
    ``VectorQuantizationStraightThrough.backward``
    (modules/vqvae_model.py:48-65). Pass ``stop_gradient(codebook)`` to
    reproduce the reference's detached-codebook call
    (modules/vqvae_model.py:100).

    Returns ``(codes, indices)``; ``indices`` is non-differentiable.
    """
    idx, codes = _nearest_with_codes(z, codebook, impl=impl)
    return codes, idx


def _vq_st_fwd(z, codebook, impl):
    idx, codes = _nearest_with_codes(z, codebook, impl=impl)
    return (codes, idx), (idx, codebook.shape[0])


def _vq_st_bwd(impl, res, cot):
    idx, k = res
    g_codes, _ = cot
    d = g_codes.shape[-1]
    g_flat = g_codes.reshape(-1, d)
    g_codebook = jnp.zeros((k, d), g_codes.dtype).at[idx.reshape(-1)].add(g_flat)
    return g_codes, g_codebook


vq_straight_through.defvjp(_vq_st_fwd, _vq_st_bwd)


def codebook_lookup(
    codebook: jax.Array,
    idx: jax.Array,
    *,
    method: Literal["auto", "gather", "onehot"] = "auto",
) -> jax.Array:
    """Differentiable ``codebook[idx]``: (...,) int -> (..., D).

    The gather transpose is a scatter-add, giving the attached-codebook
    ``z_q_x_bar`` branch (reference modules/vqvae_model.py:103-106) its
    ``index_add`` gradient for free. ``onehot`` trades the gather for an
    MXU matmul — preferable on TPU for large lookups in the decode path.
    """
    if method == "auto":
        method = "onehot" if _use_pallas_default() else "gather"
    if method == "gather":
        return jnp.take(codebook, idx, axis=0)
    k = codebook.shape[0]
    onehot = jax.nn.one_hot(idx, k, dtype=codebook.dtype)
    return onehot @ codebook
