"""Device mesh and sharding helpers.

TPU-native replacement for the reference's DDP/NCCL data parallelism
(reference: main_mage.py:83-110, train_vqvae.py:108-122): a
``jax.sharding.Mesh`` with a ``data`` axis; parameters replicated, the batch
sharded along ``data``. Gradient averaging is performed by XLA-inserted
collectives over ICI when a jitted loss averages over the sharded batch —
no explicit all-reduce calls (the DDP bucketed NCCL all-reduce equivalent).

An optional ``model`` axis is reserved for tensor parallelism of the
attention/MLP stacks (the reference has none — SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Optional[Mapping[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh. ``axes`` maps axis name -> size; one axis may be -1
    (consume all remaining devices). Default: 1-D ``data`` mesh over all
    devices."""
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes or {"data": -1})
    known = 1
    infer_key = None
    for k, v in axes.items():
        if v == -1:
            if infer_key is not None:
                raise ValueError("Only one mesh axis may be -1.")
            infer_key = k
        else:
            known *= v
    if infer_key is not None:
        if len(devices) % known:
            raise ValueError(f"{len(devices)} devices not divisible by {known}.")
        axes[infer_key] = len(devices) // known
    total = int(np.prod(list(axes.values())))
    if total != len(devices):
        raise ValueError(f"Mesh size {total} != device count {len(devices)}.")
    dev_array = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(dev_array, tuple(axes.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension along ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host-side pytree of arrays onto the mesh, sharding each
    leaf's leading dimension over ``axis``.

    Multi-host: each process passes its *local* shard (produced by a Loader
    with ``num_shards=process_count``) and the leaves are assembled into
    global arrays — the JAX-native replacement for DistributedSampler +
    per-rank batches (reference main_mage.py:93,108-110)."""
    sharding = batch_sharding(mesh, axis)
    multiprocess = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def local_batch_slice(global_batch_size: int, mesh: Mesh, axis: str = "data") -> slice:
    """The slice of the global batch owned by this process (multi-host).

    Single-controller JAX: with one process this is the whole batch."""
    n_proc = jax.process_count()
    idx = jax.process_index()
    per = global_batch_size // n_proc
    return slice(idx * per, (idx + 1) * per)
