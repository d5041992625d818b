"""context_latents: scheduled-sampling-style decoupling of the decoder's
conditioning stream from the loss targets (MAGECore.__call__ /
MagePipeline.loss_terms).

Contract:
- context_latents=None (default) is the reference-exact teacher-forced
  path (mage_model.py:586-588): passing the GT latents explicitly must be
  bit-identical to passing None.
- a different context changes the prediction, but the loss TARGETS, the
  video posterior (kl_loss), and the motion-loss weights still come from
  the GT latents.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_mage_model import L, _batch, _core, _init


def _perturb(params):
    """Deterministic nonzero perturbation: the decoder head is zero-init
    (CLIP-style, mage.py:133-135), so at init params every prediction is
    identically zero and context (in)sensitivity checks would be vacuous."""
    return jax.tree_util.tree_map(
        lambda x: x + 0.05 * jnp.cos(
            jnp.arange(x.size, dtype=jnp.float32).reshape(x.shape) * 1.7
        ) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )


def _terms(core, params, latents, text, speed, context=None, randomness=False):
    return core.apply(
        {"params": params}, latents, text, speed, train=False,
        context_latents=context,
        rngs={"dropout": jax.random.PRNGKey(1),
              "latent": jax.random.PRNGKey(2)},
    )


def test_none_equals_explicit_gt_context():
    for use_cids in (True, False):
        core = _core(use_cids=use_cids)
        latents, text, speed = _batch(use_cids=use_cids)
        params = _perturb(_init(core, latents, text, speed)["params"])
        base = _terms(core, params, latents, text, speed)
        same = _terms(core, params, latents, text, speed, context=latents)
        np.testing.assert_array_equal(
            np.asarray(base["predict"]), np.asarray(same["predict"])
        )
        assert float(base["prediction"]) == float(same["prediction"])


def test_static_context_changes_prediction_not_targets():
    core = _core(use_cids=False, randomness=True)
    latents, text, speed = _batch(use_cids=False)
    params = _perturb(_init(core, latents, text, speed)["params"])
    static = jnp.broadcast_to(latents[:, :1], latents.shape)

    base = _terms(core, params, latents, text, speed)
    aug = _terms(core, params, latents, text, speed, context=static)

    # the conditioning stream changed -> predictions differ
    assert float(np.abs(np.asarray(base["predict"])
                        - np.asarray(aug["predict"])).max()) > 1e-6
    # the posterior sees the GT video, not the context -> same KL
    np.testing.assert_allclose(
        float(base["kl_loss"]), float(aug["kl_loss"]), rtol=1e-6
    )
    # the loss is measured against GT targets: recompute from predict
    pred = np.asarray(aug["predict"], np.float32)
    target = np.asarray(latents[:, 1:L], np.float32)
    np.testing.assert_allclose(
        float(aug["prediction"]), float(((pred - target) ** 2).mean()),
        rtol=1e-5,
    )


def test_pipeline_loss_terms_passes_context():
    from tests.test_mage_pipeline import _ToyVideoDataset, _make_pipeline
    from mage_tpu.data.loader import Loader

    pipeline, _ = _make_pipeline(randomness=True)
    batch = next(iter(Loader(_ToyVideoDataset(n=8), 8, shuffle=False)))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = _perturb(pipeline.init(jax.random.PRNGKey(0), batch))

    lat = pipeline.encode_first_stage(batch["images"])
    lbatch = {"latents": lat, "text": batch["text"], "speed": batch["speed"]}
    base = pipeline.loss_terms(params, dict(lbatch), jax.random.PRNGKey(0),
                               train=False)
    lbatch["context_latents"] = jnp.broadcast_to(lat[:, :1], lat.shape)
    aug = pipeline.loss_terms(params, lbatch, jax.random.PRNGKey(0),
                              train=False)
    assert abs(float(base["prediction"]) - float(aug["prediction"])) > 0
    np.testing.assert_allclose(
        float(base["kl_loss"]), float(aug["kl_loss"]), rtol=1e-6
    )
