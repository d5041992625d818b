"""VQ-VAE model + trainer tests: shapes, encode/decode contract, and the
end-to-end "loss decreases on tiny data" integration test (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training.vqvae_trainer import (
    VQVAETrainer,
    create_state,
    loss_terms,
    make_tx,
)


def _init(model, shape, seed=0):
    return model.init(jax.random.PRNGKey(seed), jnp.zeros(shape, jnp.float32), train=True)


def test_down4_shapes():
    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=32, K=16)
    variables = _init(model, (2, 64, 64, 1))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 1), jnp.float32)
    (x_tilde, z_e, z_q), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert x_tilde.shape == (2, 64, 64, 1)
    assert z_e.shape == (2, 16, 16, 32)
    assert z_q.shape == (2, 16, 16, 32)
    assert float(jnp.abs(x_tilde).max()) <= 1.0  # tanh head

    ids = model.apply(variables, x, method="encode", mutable=False)
    assert ids.shape == (2, 16, 16) and ids.dtype == jnp.int32
    dec = model.apply(variables, ids, method="decode", mutable=False)
    assert dec.shape == (2, 64, 64, 1)


def test_down8_shapes():
    model = VectorQuantizedVAE(input_dim=3, down_ratio=8, dim=16, K=16)
    variables = _init(model, (2, 128, 128, 3))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 128, 128, 3), jnp.float32)
    ids = model.apply(variables, x, method="encode", mutable=False)
    assert ids.shape == (2, 16, 16)
    dec = model.apply(variables, ids, method="decode", mutable=False)
    assert dec.shape == (2, 128, 128, 3)
    assert model.embed_dim == 64  # codebook dim = 4*dim for down8


def test_encode_decode_consistent_with_forward():
    """encode->decode must agree with the forward pass's quantized path."""
    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=8)
    variables = _init(model, (2, 32, 32, 1))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 1), jnp.float32)
    (x_tilde, _, _), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # encode/decode in the same BN mode (train=batch stats) for comparability
    ids, _ = model.apply(variables, x, True, method="encode", mutable=["batch_stats"])
    dec, _ = model.apply(
        variables, ids, True, method="decode", mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(x_tilde), np.asarray(dec), atol=1e-5)


def test_gradients_flow_to_all_params():
    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=8)
    variables = _init(model, (2, 32, 32, 1))
    x = jnp.asarray(np.random.RandomState(2).randn(2, 32, 32, 1), jnp.float32)

    def loss_fn(params):
        loss, _ = loss_terms(model, params, variables.get("batch_stats", {}), x, 2.0)
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = {jax.tree_util.keystr(k): float(jnp.abs(v).sum()) for k, v in flat}
    # encoder (via recon+commit), decoder (via recon), codebook (via vq loss)
    assert nonzero["['codebook']"] > 0
    assert any("encoder" in k and v > 0 for k, v in nonzero.items())
    assert any("decoder" in k and v > 0 for k, v in nonzero.items())


def test_training_reduces_loss(mesh8):
    """Tiny end-to-end slice: a few steps of the real jitted train step on
    an 8-device mesh must reduce the total loss."""
    rng = np.random.RandomState(0)
    # structured toy data: blobs at random positions
    images = np.zeros((64, 32, 32, 1), np.float32)
    for i in range(64):
        y, x = rng.randint(4, 24, 2)
        images[i, y : y + 6, x : x + 6, 0] = 1.0
    images -= 0.5

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=8)
    tx = make_tx(3e-3)
    from mage_tpu.training.vqvae_trainer import make_train_step

    state = create_state(model, jax.random.PRNGKey(0), jnp.zeros((8, 32, 32, 1)), tx)
    step = make_train_step(model, tx, beta=2.0, mesh=mesh8)

    from mage_tpu.parallel import shard_batch

    losses = []
    for it in range(12):
        batch = shard_batch(images[(it % 4) * 16 : (it % 4) * 16 + 16], mesh8)
        state, aux = step(state, batch, 3e-3)
        losses.append(float(aux["total"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert int(state.step) == 12


def test_decoder_block_fused_upsample_exact():
    """DecoderBlock(upsample=True)(x) must equal
    DecoderBlock()(upsample(x)) with the SAME params: relu and the 1x1
    convs commute exactly with nearest-neighbor upsampling. Checked for
    both the channel-preserving and channel-changing identity paths."""
    from mage_tpu.models.vqvae import DecoderBlock, _upsample_nearest

    rng = np.random.RandomState(0)
    for cin, cout in [(32, 32), (64, 32)]:
        x = jnp.asarray(rng.randn(2, 6, 6, cin).astype(np.float32))
        fused = DecoderBlock(cout, upsample=True)
        naive = DecoderBlock(cout, upsample=False)
        variables = fused.init(jax.random.PRNGKey(1), x)
        out_fused = fused.apply(variables, x)
        out_naive = naive.apply(variables, _upsample_nearest(x))
        assert out_fused.shape == (2, 12, 12, cout)
        np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_naive))


def test_dead_code_restart_revives_unused_codes():
    """Opt-in codebook revival: codes a probe batch never selects are
    re-seeded to encoder outputs; codes in use are untouched."""
    import jax
    import jax.numpy as jnp

    from mage_tpu.models.vqvae import VectorQuantizedVAE
    from mage_tpu.training import vqvae_trainer as vt

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=32)
    tx = vt.make_tx(1e-4)
    state = vt.create_state(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 1)), tx)
    # collapse: push half the codebook far away so it is never selected
    cb = state.params["codebook"]
    far = cb.at[16:].set(1e3)
    state = state.replace(params=dict(state.params, codebook=far))
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 1)) - 0.5

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ids_before = model.apply(variables, images, method="encode", mutable=False)
    used = np.unique(np.asarray(ids_before))
    assert used.max() < 16  # the far half is dead

    restart = vt.make_restart_dead_codes(model)
    new_state, n_dead = restart(state, images, jax.random.PRNGKey(2))
    n_dead = int(n_dead)
    assert n_dead >= 16
    new_cb = np.asarray(new_state.params["codebook"])
    old_cb = np.asarray(far)
    np.testing.assert_array_equal(new_cb[used], old_cb[used])  # used intact
    assert np.abs(new_cb[16:]).max() < 100  # dead rows re-seeded near data
