"""bf16 inference path: generation (both samplers) and the VQ op must run
entirely in bfloat16 without silently promoting to f32."""

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.ops.vq import vq_straight_through
from tests.test_mage_model import _batch, _core, _init


def _to_bf16(tree):
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def test_bf16_generate_paths():
    core = _core(use_cids=True, randomness=True)
    latents, text, speed = _batch(True)
    variables = _to_bf16(_init(core, latents, text, speed))
    speed16 = speed.astype(jnp.bfloat16)
    for method in ("generate", "generate_cached"):
        out = core.apply(
            variables, latents[:, :1], text, speed16, method=method,
            rngs={"latent": jax.random.PRNGKey(0)},
        )
        assert out.dtype == jnp.int32
        assert 0 <= int(out.min()) and int(out.max()) < 32


def test_bf16_continuous_generate():
    core = _core(use_cids=False, randomness=True)
    latents, text, speed = _batch(False)
    variables = _to_bf16(_init(core, latents, text, speed))
    out = core.apply(
        variables, latents[:, :1].astype(jnp.bfloat16), text,
        speed.astype(jnp.bfloat16), method="generate_cached",
        rngs={"latent": jax.random.PRNGKey(0)},
    )
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_bf16_vq_straight_through():
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(16, 8), jnp.bfloat16)
    cb = jnp.asarray(rng.randn(4, 8), jnp.bfloat16)
    codes, idx = vq_straight_through(z, cb, "xla")
    assert codes.dtype == jnp.bfloat16 and idx.dtype == jnp.int32
