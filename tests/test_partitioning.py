"""Tensor-parallel partitioning tests: spec rules, divisibility fallback,
and a full DPxTP train step on a 4x2 mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.parallel import make_mesh
from mage_tpu.parallel.partitioning import param_spec, shard_params
from jax.sharding import PartitionSpec as P


def test_param_spec_rules():
    k3 = jnp.zeros((64, 2, 32))  # DenseGeneral qkv kernel
    assert param_spec("['attn']['q_proj']['kernel']", k3) == P(None, "model", None)
    k_out = jnp.zeros((2, 32, 64))
    assert param_spec("['attn']['out_proj']['kernel']", k_out) == P("model", None, None)
    k_fc = jnp.zeros((64, 256))
    assert param_spec("['mlp']['c_fc']['kernel']", k_fc) == P(None, "model")
    k_proj = jnp.zeros((256, 64))
    assert param_spec("['mlp']['c_proj']['kernel']", k_proj) == P("model", None)
    bias = jnp.zeros((64,))
    assert param_spec("['mlp']['c_fc']['bias']", bias) == P()
    other = jnp.zeros((8, 8))
    assert param_spec("['conv']['kernel']", other) == P()


def test_shard_params_divisibility_fallback():
    mesh = make_mesh({"data": 4, "model": 2})
    params = {
        "attn": {"q_proj": {"kernel": jnp.zeros((8, 2, 4))}},  # heads=2 ok
        "odd": {"c_fc": {"kernel": jnp.zeros((8, 7))}},  # 7 % 2 != 0 -> replicate
    }
    placed = shard_params(params, mesh)
    q = placed["attn"]["q_proj"]["kernel"]
    assert "model" in str(q.sharding.spec)
    odd = placed["odd"]["c_fc"]["kernel"]
    assert not any(odd.sharding.spec)


def test_dp_tp_train_step_runs():
    """Full MAGE train step on a data=4 x model=2 mesh — GSPMD partitions
    attention/MLP weights; loss must be finite and params stay sharded."""
    from __graft_entry__ import _tiny_pipeline, _batch
    from mage_tpu.config import loads_config
    from mage_tpu.training.mage_trainer import MageTrainer
    import tempfile

    mesh = make_mesh({"data": 4, "model": 2})
    pipeline = _tiny_pipeline()
    cfg = loads_config("epoch: 1\nbatchsize: 8\nlr: 1e-3\ncheckpoint_every: 10")
    with tempfile.TemporaryDirectory() as td:
        trainer = MageTrainer(pipeline, cfg, td, mesh=mesh)
        batch = _batch(pipeline, batch_size=8, height=32, width_px=32, channels=1)
        trainer.init_state(batch)
        # at least one param actually sharded on the model axis
        specs = [
            str(x.sharding.spec)
            for x in jax.tree_util.tree_leaves(trainer.state.params)
        ]
        assert any("model" in s for s in specs)
        state, terms = trainer.train_step(
            trainer.state, trainer.fs_vars, trainer._prep(batch), 1e-3,
            trainer.beta, pipeline.alpha, jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(terms["final_loss"]))
        out_specs = [
            str(x.sharding.spec) for x in jax.tree_util.tree_leaves(state.params)
        ]
        assert any("model" in s for s in out_specs)


def test_first_stage_replicated_under_tp(mesh8=None):
    """The frozen VQ-VAE stays fully replicated under the model axis (a
    deliberate composition — see parallel/partitioning.py docstring), while
    attention/MLP kernels of the stage-2 core are TP-sharded."""
    import jax
    import jax.numpy as jnp
    from mage_tpu.models.vqvae import VectorQuantizedVAE
    from mage_tpu.parallel import make_mesh
    from mage_tpu.parallel.partitioning import shard_params

    mesh = make_mesh({"data": 4, "model": 2})
    model = VectorQuantizedVAE(input_dim=1, down_ratio=4, dim=16, K=32)
    fs_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=True)
    placed = shard_params(fs_vars["params"], mesh)
    for path, x in jax.tree_util.tree_leaves_with_path(placed):
        spec = x.sharding.spec
        assert not any(spec), (jax.tree_util.keystr(path), spec)


def test_fsdp_spec_rules():
    """FSDP extends TP specs on the largest free divisible dim; small
    tensors and non-divisible shapes stay as-is."""
    from mage_tpu.parallel.partitioning import fsdp_extend_spec, FSDP_MIN_SIZE

    big = jnp.zeros((512, 256))  # 131k elements, plain kernel
    assert fsdp_extend_spec(P(), big, 4) == P("data", None)
    # TP column spec on axis 1: FSDP takes the remaining (largest free) axis
    qkv = jnp.zeros((512, 8, 64))
    assert fsdp_extend_spec(P(None, "model", None), qkv, 4) == P(
        "data", "model", None
    )
    small = jnp.zeros((64,))
    assert fsdp_extend_spec(P(), small, 4) == P()
    odd = jnp.zeros((513, 255))
    assert odd.size >= FSDP_MIN_SIZE
    assert fsdp_extend_spec(P(), odd, 4) == P()


def test_fsdp_train_step_matches_replicated(mesh8):
    """ZeRO-3: with ``fsdp: true`` large params and Adam moments live
    data-sharded, and one train step is numerically identical to the
    replicated run (GSPMD placement must not change the math)."""
    from __graft_entry__ import _tiny_pipeline, _batch
    from mage_tpu.config import loads_config
    from mage_tpu.training.mage_trainer import MageTrainer
    import tempfile

    pipeline = _tiny_pipeline()
    batch = _batch(pipeline, batch_size=8, height=32, width_px=32, channels=1)
    losses, sharded_leaf_counts = [], []
    for fsdp in (False, True):
        cfg = loads_config(
            "epoch: 1\nbatchsize: 8\nlr: 1e-3\ncheckpoint_every: 10\n"
            f"fsdp: {str(fsdp).lower()}"
        )
        with tempfile.TemporaryDirectory() as td:
            trainer = MageTrainer(pipeline, cfg, td, mesh=mesh8, seed=0)
            trainer.init_state(batch)
            n_sharded = sum(
                1
                for x in jax.tree_util.tree_leaves(trainer.state.params)
                if any(x.sharding.spec)
            )
            sharded_leaf_counts.append(n_sharded)
            state, terms = trainer.train_step(
                trainer.state, trainer.fs_vars, trainer._prep(batch), 1e-3,
                trainer.beta, pipeline.alpha, jax.random.PRNGKey(0),
            )
            losses.append(float(terms["final_loss"]))
            if fsdp:
                # updated params AND Adam moments keep the data sharding
                out_specs = [
                    str(x.sharding.spec)
                    for x in jax.tree_util.tree_leaves(state.params)
                ] + [
                    str(x.sharding.spec)
                    for x in jax.tree_util.tree_leaves(state.opt_state)
                ]
                assert any("data" in s for s in out_specs)
    assert sharded_leaf_counts[0] == 0 and sharded_leaf_counts[1] > 0
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_fsdp_composes_with_tp():
    """DP(FSDP) x TP on a 4x2 mesh: a QKV kernel carries both axes."""
    from mage_tpu.parallel.partitioning import shard_params

    mesh = make_mesh({"data": 4, "model": 2})
    params = {
        "attn": {"q_proj": {"kernel": jnp.zeros((512, 2, 64))}},
        "plain": {"kernel": jnp.zeros((512, 256))},
        "bias": {"b": jnp.zeros((512,))},
    }
    placed = shard_params(params, mesh, fsdp_axis="data")
    q = placed["attn"]["q_proj"]["kernel"].sharding.spec
    assert q == P("data", "model", None)
    assert placed["plain"]["kernel"].sharding.spec == P("data", None)
    assert not any(placed["bias"]["b"].sharding.spec)


def test_sharded_generation_matches_single_device(mesh8):
    """Batch-parallel AR generation: the cached sampler under a data-sharded
    batch (params replicated over the mesh) produces exactly the ids of the
    unsharded run — multi-chip inference is plain data parallelism, the
    per-chip number in BENCH_NOTES scales by chip count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mage_tpu.parallel import replicated_sharding, shard_batch
    from tests.test_mage_model import _batch, _core, _init

    core = _core(use_cids=True, randomness=True)
    latents, text, speed = _batch(True, b=8)
    variables = _init(core, latents, text, speed)
    noise = jnp.zeros((8, 4, 4, 64), jnp.float32)

    def gen(vars_, lat0, txt, spd, nz):
        return core.apply(vars_, lat0, txt, spd, video_noise=nz,
                          method="generate_cached")

    ref = jax.jit(gen)(variables, latents[:, :1], text, speed, noise)

    v_repl = jax.device_put(variables, replicated_sharding(mesh8))
    sharded = shard_batch(
        {"lat0": latents[:, :1], "text": text, "speed": speed, "noise": noise},
        mesh8,
    )
    out = jax.jit(gen)(v_repl, sharded["lat0"], sharded["text"],
                       sharded["speed"], sharded["noise"])
    assert len(out.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
