"""Weight EXPORT (mage_tpu -> reference PyTorch): the exported state_dicts
strict-load into the actual reference modules, round-trip exactly through
torch_import, and the reference model under exported weights reproduces
this framework's outputs (encode ids, teacher-forced losses)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mage_tpu.compat.torch_export import (  # noqa: E402
    export_mage_core,
    export_vqvae,
    to_torch,
)
from mage_tpu.compat.torch_import import import_mage_core, import_vqvae  # noqa: E402

# reuse the reference-import fixture + builders from the parity suite
from tests.test_reference_parity import (  # noqa: F401,E402
    _K,
    _L,
    _LAT,
    _RES,
    _W,
    _build_ref_mage,
    _text_batch,
    _zero_noise,
    ref,
)


def _assert_trees_equal(a, b):
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("down_ratio,res", [(4, 32), (8, 64)])
def test_vqvae_export_strict_load_roundtrip_and_forward(ref, down_ratio, res):
    from mage_tpu.models.vqvae import VectorQuantizedVAE

    model = VectorQuantizedVAE(input_dim=1, down_ratio=down_ratio, dim=16, K=_K)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 1)), train=True
    )
    sd = to_torch(export_vqvae(variables, down_ratio))

    tmodel = ref.vqvae.VectorQuantizedVAE(
        input_dim=1, down_ratio=down_ratio, dim=16, K=_K
    )
    tmodel.load_state_dict(sd, strict=True)
    tmodel.eval()

    # exact round-trip back to our tree
    back = import_vqvae(sd, down_ratio=down_ratio)
    _assert_trees_equal(variables["params"], back["params"])
    if variables.get("batch_stats"):
        _assert_trees_equal(variables["batch_stats"], back["batch_stats"])

    # the reference under exported weights reproduces our encode ids
    x = np.random.RandomState(2).randn(2, 1, res, res).astype(np.float32) * 0.5
    with torch.no_grad():
        t_ids = tmodel.encode(torch.tensor(x))
    j_ids = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), method="encode",
        mutable=False,
    )
    np.testing.assert_array_equal(np.asarray(j_ids), t_ids.numpy())


def test_mage_export_strict_load_roundtrip_and_forward(ref, monkeypatch):
    from mage_tpu.models.mage import MAGECore
    from mage_tpu.models.vqvae import VectorQuantizedVAE

    _zero_noise(monkeypatch)

    core = MAGECore(
        codebook_size=_K, frames_length=_L, image_resolution=_LAT,
        vision_width=_W, dropout=0.1, use_cids=True, randomness=True,
        text_vocab_size=30, text_context_length=12, text_width=_W,
        text_layers=1, text_output_dim=_W, ma_layers=1, ma_d_model=_W,
        dec_layers=3, dec_out_channels=_K,
    )
    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.randint(0, _K, size=(2, _L, _LAT, _LAT)), jnp.int32)
    text_np, speed_np = _text_batch()
    text = jnp.asarray(text_np, jnp.int32)
    speed = jnp.asarray(speed_np)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent": jax.random.PRNGKey(2)}
    params = core.init(rngs, latents, text, speed, train=False)["params"]

    fs_model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=_K)
    fs_vars = fs_model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, _RES, _RES, 1)), train=True
    )

    sd = to_torch(
        export_mage_core(
            params, use_cids=True, randomness=True, text_layers=1,
            ma_layers=1, dec_layers=3,
            first_stage=export_vqvae(fs_vars, down_ratio=4),
        )
    )
    tmage = _build_ref_mage(
        ref, True, "modules.vqvae_model.VectorQuantizedVAE",
        {"input_dim": 1, "down_ratio": 4, "dim": 16, "K": _K}, _K,
    )
    tmage.load_state_dict(sd, strict=True)
    tmage.eval()

    # exact round-trip of the core params
    back = import_mage_core(
        sd, use_cids=True, randomness=True, vision_width=_W, ma_d_model=_W,
        text_width=_W, text_layers=1, ma_layers=1, dec_layers=3,
    )
    _assert_trees_equal(params, back)

    # the reference under exported weights reproduces our teacher-forced
    # loss terms (end-to-end from pixels through its own frozen VQ-VAE)
    images = (
        np.random.RandomState(5).rand(2, _L, 1, _RES, _RES).astype(np.float32)
        - 0.5
    )
    with torch.no_grad():
        t_latents = tmage.first_stage_encode(torch.tensor(images))
        t_final, t_loss = tmage(
            {"images": torch.tensor(images), "text": torch.tensor(text_np),
             "speed": torch.tensor(speed_np)}
        )

    j_latents = fs_model.apply(
        fs_vars,
        jnp.asarray(images.transpose(0, 1, 3, 4, 2).reshape(-1, _RES, _RES, 1)),
        method="encode", mutable=False,
    ).reshape(2, _L, _LAT, _LAT)
    np.testing.assert_array_equal(np.asarray(j_latents), t_latents.numpy())

    out = core.apply(
        {"params": params}, j_latents, text, speed, train=False,
        rngs={"latent": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        float(out["prediction"]), float(t_loss["val/prediction"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        float(out["kl_loss"]), float(t_loss["val/kl_loss"]), rtol=1e-4, atol=1e-6
    )


def test_mage_plus_export_roundtrip(ref):
    """Continuous (pre-LN) variant: export covers ln_q/ln_kv and the
    GroupNorm+zero-init-conv3d head; exact round-trip through import."""
    from mage_tpu.models.mage import MAGECore

    core = MAGECore(
        codebook_size=_K, frames_length=_L, image_resolution=_LAT,
        vision_width=_W, embed_dim=4, dropout=0.1, use_cids=False,
        randomness=True, pre_ln=True, text_vocab_size=30,
        text_context_length=12, text_width=_W, text_layers=1,
        text_output_dim=_W, ma_layers=1, ma_d_model=_W, dec_layers=3,
        dec_out_channels=4,
    )
    rng = np.random.RandomState(0)
    latents = jnp.asarray(rng.randn(2, _L, _LAT, _LAT, 4), jnp.float32)
    text_np, speed_np = _text_batch()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "latent": jax.random.PRNGKey(2)}
    params = core.init(
        rngs, latents, jnp.asarray(text_np, jnp.int32), jnp.asarray(speed_np),
        train=False,
    )["params"]

    sd = to_torch(
        export_mage_core(
            params, use_cids=False, randomness=True, text_layers=1,
            ma_layers=1, dec_layers=3, pre_ln=True,
        )
    )
    back = import_mage_core(
        sd, use_cids=False, randomness=True, vision_width=_W, ma_d_model=_W,
        text_width=_W, text_layers=1, ma_layers=1, dec_layers=3, pre_ln=True,
    )
    _assert_trees_equal(params, back)


def test_convert_cli_export_roundtrip(tmp_path):
    """orbax -> export-vqvae (.pt) -> vqvae (orbax) round-trips through the
    CLI surface."""
    import jax
    import jax.numpy as jnp

    from mage_tpu.compat import convert
    from mage_tpu.models.vqvae import VectorQuantizedVAE
    from mage_tpu.training.checkpoint import Checkpointer

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=8, K=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=True
    )
    ckpt = Checkpointer(str(tmp_path))
    ckpt.save("orig", jax.device_get(variables))

    pt = str(tmp_path / "exported.pt")
    convert.main(["export-vqvae", "--input", str(tmp_path / "orig"),
                  "--down-ratio", "4", "--output", pt])
    convert.main(["vqvae", "--input", pt, "--down-ratio", "4",
                  "--output", str(tmp_path / "back")])

    back = _restore_tree(str(tmp_path / "back"))
    _assert_trees_equal(variables["params"], back["params"])
    _assert_trees_equal(variables["batch_stats"], back["batch_stats"])


def _restore_tree(path):
    import os

    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))
