import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mage_tpu.parallel import batch_sharding, make_mesh, replicated_sharding, shard_batch


def test_mesh_has_8_devices(mesh8):
    assert mesh8.devices.size == 8
    assert mesh8.axis_names == ("data",)


def test_2d_mesh():
    m = make_mesh({"data": 4, "model": 2})
    assert m.shape == {"data": 4, "model": 2}


def test_bad_mesh_size():
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_shard_batch_and_grad_averaging(mesh8):
    """Data-parallel gradient correctness: grads of a mean loss over a
    sharded batch equal the single-device grads over the full batch."""
    batch = np.arange(32, dtype=np.float32).reshape(16, 2)
    sharded = shard_batch({"x": batch}, mesh8)
    assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh8), 2)

    w = jax.device_put(jnp.ones((2,)), replicated_sharding(mesh8))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_sharded = jax.jit(jax.grad(loss))(w, sharded["x"])
    g_local = jax.grad(loss)(jnp.ones((2,)), jnp.asarray(batch))
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_local), rtol=1e-6)
