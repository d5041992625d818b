"""Tensor-parallel + FSDP parameter partitioning (GSPMD).

The reference has no tensor parallelism (SURVEY.md §2.7) — at d_model=512
none is needed for parity. This module adds it the TPU way regardless: the
train step is already one jitted program over a Mesh, so TP is purely a
*placement* decision — Megatron-style column-parallel QKV/FFN-in and
row-parallel output projections expressed as NamedShardings on the params.
XLA/GSPMD inserts the all-reduces over ICI; no model code changes.

Works with any mesh that has a ``model`` axis, composing with the ``data``
axis (DP x TP).

FSDP (ZeRO-3-style) composes the same way: pass ``fsdp_axis="data"`` to
``shard_params`` and every large parameter additionally shards one
remaining dimension over the data axis. Params and Adam moments then live
sharded across the data group (per-chip param+opt memory drops by the
axis size); GSPMD inserts the forward/backward all-gathers and turns the
gradient all-reduce into a reduce-scatter over ICI. Small tensors
(< ``FSDP_MIN_SIZE`` elements: biases, LN scales, small embeddings) stay
replicated — gathering them would cost more latency than the bytes saved.

Parallelism axes deliberately NOT implemented (not omissions):
pipeline parallelism (the flagship stack is 6 axial layers / ~60 M params —
activations dominate; DPxTPxFSDP covers every memory/throughput regime the
recipe can reach) and expert parallelism (no MoE anywhere in the reference
model family).

Deliberately replicated under the ``model`` axis (not an omission):

- the frozen VQ-VAE first stage (conv kernels, BatchNorm): it is inference
  -only inside the train step, its per-frame activations dominate over its
  ~7 M params, and replication keeps its BatchNorm statistics trivially
  consistent (no cross-shard stat sync needed);
- all biases/scales/embeddings and every non-attention/MLP kernel.

``tests/test_partitioning.py::test_first_stage_replicated_under_tp`` pins
this contract.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: shard the output features (last axis of the kernel)
_COLUMN_KEYS = ("q_proj", "k_proj", "v_proj", "c_fc", "linear1")
# row-parallel: shard the input features (first axis of the kernel)
_ROW_KEYS = ("out_proj", "c_proj", "linear2")


def param_spec(path: str, value: Any, model_axis: str = "model") -> P:
    """PartitionSpec for one parameter, keyed on its tree path."""
    ndim = getattr(value, "ndim", 0)
    if ndim < 2:
        return P()  # biases, scales, 1-D embeddings: replicate
    is_kernel = path.endswith("kernel']") or path.endswith("/kernel")
    if not is_kernel:
        return P()
    if any(k in path for k in _COLUMN_KEYS):
        # DenseGeneral QKV kernels are (d, heads, head_dim): shard heads
        spec = [None] * ndim
        spec[1 if ndim == 3 else ndim - 1] = model_axis
        return P(*spec)
    if any(k in path for k in _ROW_KEYS):
        # out_proj kernels are (heads, head_dim, d) or (4d, d): shard axis 0
        spec = [None] * ndim
        spec[0] = model_axis
        return P(*spec)
    return P()


# FSDP shards only params with at least this many elements; smaller ones
# (biases, LN scales) replicate — the all-gather latency beats the bytes.
FSDP_MIN_SIZE = 2 ** 15


def fsdp_extend_spec(spec: P, value: Any, data_axis_size: int,
                     data_axis: str = "data",
                     min_size: int | None = None) -> P:
    """Extend a (possibly empty) TP spec with a data-axis shard on the
    largest still-free, divisible dimension. Returns ``spec`` unchanged if
    the param is small or no dimension divides."""
    ndim = getattr(value, "ndim", 0)
    size = getattr(value, "size", 0)
    if min_size is None:
        min_size = FSDP_MIN_SIZE
    if ndim < 1 or size < min_size or data_axis_size <= 1:
        return spec
    full = list(spec) + [None] * (ndim - len(spec))
    for dim in sorted(range(ndim), key=lambda d: -value.shape[d]):
        if full[dim] is None and value.shape[dim] % data_axis_size == 0:
            full[dim] = data_axis
            return P(*full)
    return spec


def shard_params(params: Any, mesh: Mesh, model_axis: str = "model",
                 fsdp_axis: str | None = None,
                 fsdp_min_size: int | None = None) -> Any:
    """Place a param tree on ``mesh`` with TP shardings (replicated over
    every other axis). Divisibility-guarded: any dim not divisible by the
    axis size falls back to replication. With ``fsdp_axis`` set, large
    params additionally shard one free dimension over that axis (ZeRO-3)."""
    axis_size = mesh.shape.get(model_axis, 1)
    fsdp_size = mesh.shape.get(fsdp_axis, 1) if fsdp_axis else 1

    def _place(path, x):
        spec = param_spec(jax.tree_util.keystr(path), x, model_axis)
        if axis_size > 1 and any(spec):
            for dim, name in enumerate(spec):
                if name == model_axis and x.shape[dim] % axis_size:
                    spec = P()
                    break
        elif axis_size <= 1:
            spec = P()  # no model axis on this mesh: TP spec is vacuous
        if fsdp_axis is not None:
            spec = fsdp_extend_spec(spec, x, fsdp_size, fsdp_axis,
                                    min_size=fsdp_min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_place, params)


def sharding_summary(params: Any, mesh: Mesh,
                     model_axis: str = "model") -> dict[str, int]:
    """Count params by their ACTUAL placed sharding — for logging/tests.

    Reads each leaf's ``x.sharding.spec`` (so FSDP/data shardings applied
    by ``place_params`` are counted, not just recomputed TP intent —
    ADVICE r3); leaves without a sharding (host arrays) count as
    replicated. Buckets: ``model`` (any dim on the model axis), ``data``
    (sharded over a non-model axis only, i.e. FSDP/ZeRO), ``replicated``."""
    counts = {"model": 0, "data": 0, "replicated": 0}
    for x in jax.tree_util.tree_leaves(params):
        spec = getattr(getattr(x, "sharding", None), "spec", None)
        names = [
            n
            for part in (spec or ())
            if part is not None
            for n in ((part,) if isinstance(part, str) else tuple(part))
        ]
        if model_axis in names:
            counts["model"] += 1
        elif names:
            counts["data"] += 1
        else:
            counts["replicated"] += 1
    return counts
