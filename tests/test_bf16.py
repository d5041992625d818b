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


def test_remat_grads_match_no_remat():
    """remat=True must be a pure performance/memory knob: identical param
    tree, matching loss gradients."""
    from tests.test_mage_model import _core, _batch, _init

    base = _core(use_cids=False, randomness=True)
    remat = base.clone(remat=True)
    latents, text, speed = _batch(False)
    variables = _init(base, latents, text, speed)

    def loss(core, params):
        out = core.apply(
            {"params": params}, latents, text, speed, train=True,
            rngs={"dropout": jax.random.PRNGKey(3),
                  "latent": jax.random.PRNGKey(4)},
        )
        return out["prediction"] + 0.1 * out["kl_loss"]

    # identical init trees
    v_remat = _init(remat, latents, text, speed)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v_remat)

    g0 = jax.grad(lambda p: loss(base, p))(variables["params"])
    g1 = jax.grad(lambda p: loss(remat, p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_bf16_compute_keeps_f32_losses():
    """With bf16 params the loss reductions stay f32 and land near the f32
    result (mixed-precision contract of make_mage_train_step)."""
    from tests.test_mage_model import _core, _batch, _init

    core = _core(use_cids=True, randomness=True)
    latents, text, speed = _batch(True)
    variables = _init(core, latents, text, speed)
    rngs = {"dropout": jax.random.PRNGKey(3), "latent": jax.random.PRNGKey(4)}
    out32 = core.apply(variables, latents, text, speed, train=False, rngs=rngs)
    out16 = core.apply(
        _to_bf16(variables), latents, text, speed.astype(jnp.bfloat16),
        train=False, rngs=rngs,
    )
    for key in ("prediction", "kl_loss", "speed_l2"):
        assert out16[key].dtype == jnp.float32, key
        np.testing.assert_allclose(
            float(out32[key]), float(out16[key]), rtol=0.08, atol=0.02
        )


def test_bf16_train_step_trains_with_f32_master_params(tmp_path, mesh8):
    from mage_tpu.data.loader import Loader
    from mage_tpu.training.mage_trainer import MageTrainer
    from tests.test_mage_pipeline import _ToyVideoDataset, _make_pipeline

    pipeline, cfg = _make_pipeline(randomness=True, auto_beta=False)
    cfg.train.bf16 = True
    trainer = MageTrainer(pipeline, cfg.train, str(tmp_path / "ckpt"), mesh=mesh8)
    loader = Loader(_ToyVideoDataset(n=16, frames=5, size=32), 8, drop_last=True)
    first = next(iter(loader))
    trainer.init_state(first)

    losses = []
    for i in range(8):
        trainer.state, terms = trainer.train_step(
            trainer.state, trainer.fs_vars, trainer._prep(first), 1e-3,
            trainer.beta, pipeline.alpha, jax.random.PRNGKey(i),
        )
        losses.append(float(terms["final_loss"]))
    assert losses[-1] < losses[0], losses
    # master params stayed f32
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
