"""Real two-process multi-host test on CPU: ``jax.distributed.initialize``
with 2 localhost processes (2 virtual CPU devices each -> a 4-device global
mesh), process-sharded Loader batches assembled via
``jax.make_array_from_process_local_data`` (parallel/mesh.py:61-78), one
data-parallel VQ-VAE train step, and identical post-step parameters on both
processes — the JAX-native equivalent of the reference's multi-node DDP
launch (main_mage.py:70-106)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import numpy as np

coordinator, pid = sys.argv[1], int(sys.argv[2])

import jax
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
import jax.numpy as jnp
from mage_tpu.data.loader import Loader
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from mage_tpu.training import vqvae_trainer as vt

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

# deterministic dataset shared by both processes; each loads its own shard
data = np.random.RandomState(0).rand(16, 32, 32, 1).astype(np.float32) - 0.5


class DS:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        return data[i]


loader = Loader(DS(), batch_size=4, shuffle=True, seed=0, drop_last=True,
                num_shards=jax.process_count(),
                shard_index=jax.process_index())
loader.set_epoch(0)

mesh = make_mesh({"data": -1})
model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=8, K=16)
tx = vt.make_tx(1e-3)
state = vt.create_state(model, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), tx)
state = jax.device_put(state, replicated_sharding(mesh))
train_step = vt.make_train_step(model, tx, 2.0, mesh)

local = next(iter(loader))               # this process's shard (4, 32, 32, 1)
batch = shard_batch(local, mesh)          # global (8, 32, 32, 1)
assert batch.shape[0] == 8, batch.shape
state, aux = train_step(state, batch, 1e-3)

# fully-replicated checksum: identical across processes iff the gradient
# all-reduce saw the same global batch everywhere
checksum = float(
    jax.device_get(
        sum(jnp.sum(jnp.abs(x)) for x in jax.tree_util.tree_leaves(state.params))
    )
)
loss = float(jax.device_get(aux["total"]))
print(f"RESULT {pid} {checksum:.10f} {loss:.10f}", flush=True)
"""


def test_two_process_data_parallel_step(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, checksum, loss = line.split()
                results[int(pid)] = (float(checksum), float(loss))
    assert set(results) == {0, 1}, outs
    c0, l0 = results[0]
    c1, l1 = results[1]
    assert c0 == pytest.approx(c1, rel=0, abs=0), (c0, c1)
    assert l0 == pytest.approx(l1, rel=0, abs=0), (l0, l1)
    assert np.isfinite(c0) and c0 > 0


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
