"""Integration: config-driven MagePipeline + MageTrainer on tiny shapes —
loss decreases, checkpoints round-trip, PID auto-beta engages, generation
produces videos with the ground-truth first frame prepended."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mage_tpu.config import loads_config, instantiate_from_config
from mage_tpu.training.pid import PIDControl

TINY_CFG = """
train:
  epoch: 2
  batchsize: 8
  lr: 1e-3
  cos: true
  checkpoint_every: 4
model:
  target: mage_tpu.models.pipeline.MagePipeline
  params:
    codebook_size: 32
    frames_length: 5
    image_resolution: 8
    vision_width: 64
    dropout: 0.1
    use_cids: true
    randomness: {randomness}
    alpha: 0.001
    beta: 0.00025
    auto_beta: {auto_beta}
    v_kl: 10
    first_stage_config:
      target: mage_tpu.models.vqvae.VectorQuantizedVAE
      params:
        input_dim: 1
        dim: 16
        down_ratio: 4
        K: 32
    text_encoder_config:
      target: mage_tpu.models.layers.TransformerTextEncoder
      params:
        vocab_size: 30
        context_length: 12
        transformer_width: 64
        transformer_layers: 1
        output_dim: 64
        padding_idx: 0
        dropout: 0.1
    ma_config:
      target: mage_tpu.models.layers.MAEncoder
      params:
        layers: 1
        d_model: 64
    generate_decoder_config:
      target: mage_tpu.models.mage.FlatAxialDecoder
      params:
        in_channels: 64
        out_channels: 32
        model_channels: 64
        frames_length: 5
        layers: 3
"""


class _ToyVideoDataset:
    """Deterministic moving-square videos + templated captions."""

    def __init__(self, n=32, frames=5, size=32):
        self.n, self.frames, self.size = n, frames, size

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        video = np.zeros((self.frames, self.size, self.size, 1), np.float32)
        y = rng.randint(2, self.size - 10)
        for t in range(self.frames):
            x = 2 + (idx % 2) * 2 * t + 2 * t
            video[t, y : y + 8, x % (self.size - 8) : x % (self.size - 8) + 8] = 1.0
        video -= 0.5
        text = np.zeros((12,), np.int32)
        text[0], text[1], text[2] = 1, 13, 2
        return {
            "images": video,
            "text": text,
            "speed": np.float32(rng.rand()),
        }


def _make_pipeline(randomness=True, auto_beta=False):
    cfg = loads_config(
        TINY_CFG.format(randomness=str(randomness).lower(),
                        auto_beta=str(auto_beta).lower())
    )
    return instantiate_from_config(cfg.model), cfg


def test_pipeline_instantiates_from_reference_schema():
    pipeline, _ = _make_pipeline()
    assert pipeline.core.frames_length == 5
    assert pipeline.first_stage.model.down_ratio == 4


def test_trainer_loss_decreases_and_checkpoints(tmp_path, mesh8):
    from mage_tpu.data.loader import Loader
    from mage_tpu.training.mage_trainer import MageTrainer

    pipeline, cfg = _make_pipeline(randomness=True, auto_beta=False)
    trainer = MageTrainer(pipeline, cfg.train, str(tmp_path / "ckpt"), mesh=mesh8)
    ds = _ToyVideoDataset(n=32, frames=5, size=32)
    train_loader = Loader(ds, 8, shuffle=True, drop_last=True)
    test_loader = Loader(ds, 8, shuffle=False, drop_last=True)

    first = next(iter(train_loader))
    trainer.init_state(first)

    # manual short loop to capture losses
    import jax as _jax

    losses = []
    for i in range(8):
        state, terms = trainer.train_step(
            trainer.state, trainer.fs_vars, trainer._prep(first), 1e-3,
            trainer.beta, pipeline.alpha, _jax.random.PRNGKey(i),
        )
        trainer.state = state
        losses.append(float(terms["final_loss"]))
    assert losses[-1] < losses[0], losses

    val = trainer.validate_and_checkpoint(test_loader, epoch=0)
    assert np.isfinite(val)
    assert trainer.ckpt.exists("model_best")
    assert trainer.ckpt.exists(f"iteration_{trainer.iteration}")

    # resume round-trip restores step/params
    step_before = int(trainer.state.step)
    trainer.resume("model_best")
    assert int(trainer.state.step) == step_before


def test_auto_beta_pid_engages(tmp_path, mesh8):
    from mage_tpu.data.loader import Loader
    from mage_tpu.training.mage_trainer import MageTrainer

    pipeline, cfg = _make_pipeline(randomness=True, auto_beta=True)
    trainer = MageTrainer(pipeline, cfg.train, str(tmp_path / "ckpt"), mesh=mesh8)
    ds = _ToyVideoDataset(n=16)
    loader = Loader(ds, 8, shuffle=False, drop_last=True)
    first = next(iter(loader))
    trainer.init_state(first)
    assert trainer.beta == 0.0  # PID starts at 0
    import jax as _jax

    # SAME-STEP semantics (reference mage_model.py:628-631): the in-step
    # beta must equal the host controller fed with THIS step's KL
    host_pid = PIDControl()
    pid_state = trainer.pid_state
    for i in range(3):
        state, terms = trainer.train_step(
            trainer.state, trainer.fs_vars, trainer._prep(first), 1e-3,
            pid_state, pipeline.alpha, _jax.random.PRNGKey(i),
        )
        trainer.state = state
        pid_state = terms.pop("_pid_state")
        kl = float(terms["kl_loss"])
        beta_step = float(terms["beta"])
        beta_host, _ = host_pid.pid(pipeline.v_kl, kl)
        assert 0.0 <= beta_step <= 1.0
        assert abs(beta_step - beta_host) < 1e-5, (i, beta_step, beta_host)
        # the step's final loss was weighted with the same-step beta
        expect = float(terms["prediction"]) + beta_step * kl
        assert abs(float(terms["final_loss"]) - expect) < 1e-4


def test_pid_reference_semantics():
    pid = PIDControl()
    # far-above-target KL -> negative error -> P ~ Kp, I grows positive
    b1, e1 = pid.pid(10.0, 100.0)
    assert e1 == -90.0 and 0.0 <= b1 <= 1.0
    # repeated large KL keeps increasing beta via the integral term
    b2, _ = pid.pid(10.0, 100.0)
    assert b2 >= b1
    # KL far below target -> beta clamps to 0
    pid2 = PIDControl()
    b3, _ = pid2.pid(100.0, 0.0)
    assert b3 == 0.0


def test_pid_anti_windup_recovers_from_low_kl_start():
    """The r3 failure mode: KL near zero for many steps (integral winds
    down with the reference's dead guard), then KL overshoots the target.
    The anti-windup controller must engage beta immediately; the
    reference-exact controller stays saturated at 0 for a long time."""
    import jax as _jax
    import jax.numpy as _jnp

    from mage_tpu.training.pid import initial_pid_state, pid_update

    def run(anti_windup):
        host = PIDControl(anti_windup=anti_windup)
        state = initial_pid_state()
        betas = []
        # 200 warmup steps at KL ~ 0 (target 100), then 50 steps at KL 200
        for kl in [0.5] * 200 + [200.0] * 50:
            b_host, _ = host.pid(100.0, kl)
            b_jit, state = pid_update(
                state, 100.0, _jnp.float32(kl), anti_windup=anti_windup
            )
            # the jit twin must track the host twin bit-for-bit-ish
            assert abs(float(b_jit) - b_host) < 1e-6, (kl, float(b_jit), b_host)
            betas.append(b_host)
        return betas

    fixed = run(True)
    broken = run(False)
    # during the low-KL phase both saturate at 0
    assert max(fixed[:200]) == 0.0 and max(broken[:200]) == 0.0
    # once KL overshoots, the anti-windup controller engages within steps
    assert max(fixed[200:210]) > 0.0, fixed[200:210]
    # and ramps: by step 50 of overshoot it is regulating meaningfully
    assert fixed[-1] > 1e-4
    # the reference-exact controller is still pinned at 0 (wound down)
    assert max(broken[200:]) == 0.0, max(broken[200:])


def test_generation_end_to_end(tmp_path, mesh8):
    from mage_tpu.training.mage_trainer import MageTrainer
    from mage_tpu.data.loader import Loader

    pipeline, cfg = _make_pipeline(randomness=True)
    trainer = MageTrainer(pipeline, cfg.train, str(tmp_path / "c"), mesh=mesh8)
    ds = _ToyVideoDataset(n=8)
    loader = Loader(ds, 8, shuffle=False)
    batch = next(iter(loader))
    trainer.init_state(batch)

    video = pipeline.generate(
        jax.device_get(trainer.state.params),
        {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0),
    )
    assert video.shape == (8, 5, 32, 32, 1)
    # ground-truth first frame prepended exactly (reference :691)
    np.testing.assert_allclose(
        np.asarray(video[:, 0]), batch["images"][:, 0], atol=1e-6
    )


def test_chunked_frames_matches_single_shot():
    import jax.numpy as jnp
    from mage_tpu.models.pipeline import _chunked_frames

    x = jnp.arange(24.0).reshape(12, 2)
    fn = lambda c: c * 2.0 + 1.0
    np.testing.assert_allclose(
        np.asarray(_chunked_frames(fn, x, max_chunk=5)),  # divisor search -> 4
        np.asarray(fn(x)),
    )
    np.testing.assert_allclose(  # n <= max_chunk: single shot
        np.asarray(_chunked_frames(fn, x, max_chunk=100)), np.asarray(fn(x))
    )
    # prime n falls back to single shot
    y = jnp.arange(14.0).reshape(7, 2)
    np.testing.assert_allclose(
        np.asarray(_chunked_frames(fn, y, max_chunk=4)), np.asarray(fn(y))
    )


def test_first_stage_max_chunk_bit_identical():
    """encode/decode with a small max_chunk (the f32-at-128px HBM knob,
    train_cater_e2e eval) must match the unchunked path bit for bit."""
    import jax
    import jax.numpy as jnp
    from mage_tpu.models.pipeline import FirstStageVQVAE
    from mage_tpu.models.vqvae import VectorQuantizedVAE

    model = VectorQuantizedVAE(input_dim=3, down_ratio=4, dim=16, K=32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   train=True)
    fs = FirstStageVQVAE(model, v)
    ids = jax.random.randint(jax.random.PRNGKey(1), (3, 4, 8, 8), 0, 32)
    full = fs.decode(ids)
    chunked = fs.decode(ids, max_chunk=4)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))
    vids = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32, 3))
    np.testing.assert_array_equal(
        np.asarray(fs.encode(vids)),
        np.asarray(fs.encode(vids, max_chunk=2)),
    )


def test_nested_targets_select_classes():
    """Nested ``target:`` fields drive class selection (reference
    mage_model.py:474-477): reference class paths are alias-resolved, and a
    non-default text encoder (BertTextualHead with a tiny offline BERT) is
    reachable from YAML alone."""
    from mage_tpu.models.text_heads import BertTextualHead

    cfg = loads_config(
        TINY_CFG.format(randomness="false", auto_beta="false")
    ).model
    # reference-repo class names must resolve to our classes
    cfg.params.first_stage_config.target = "modules.vqvae_model.VectorQuantizedVAE"
    cfg.params.ma_config.target = "modules.mage_model.MAEncoder"
    cfg.params.generate_decoder_config.target = "modules.mage_model.FlatAxialDecoder"
    # swap in the BERT head purely via config
    cfg.params.text_encoder_config = {
        "target": "modules.mage_model.BertTextualHead",
        "params": {
            "out_dim": 64,
            "bert_config": {
                "vocab_size": 30,
                "hidden_size": 32,
                "num_hidden_layers": 1,
                "num_attention_heads": 2,
                "intermediate_size": 64,
                "max_position_embeddings": 16,
                "pad_token_id": 0,
            },
        },
    }
    pipeline = instantiate_from_config(cfg)
    assert isinstance(pipeline.core.text_encoder_cls, type)
    assert pipeline.core.text_encoder_cls is BertTextualHead

    batch = {
        "images": np.random.RandomState(0).rand(2, 5, 32, 32, 1).astype(np.float32) - 0.5,
        "text": np.array([[1, 5, 7, 2] + [0] * 8, [1, 9, 3, 2] + [0] * 8], np.int32),
        "speed": np.array([0.2, 0.7], np.float32),
    }
    params = pipeline.init(jax.random.PRNGKey(0), batch)
    assert "bert" in params["text_encoder"]
    terms = pipeline.loss_terms(
        params, batch, jax.random.PRNGKey(1), train=False
    )
    assert np.isfinite(float(terms["prediction"]))


def test_bert_pretrained_weight_path_round_trip(tmp_path):
    """The pretrained-BERT path end to end with a locally-SAVED checkpoint
    (no hub access): save a tiny FlaxBertModel with save_pretrained, build
    BertTextualHead(bert_path=...), graft load_pretrained_bert_params'
    tree under params['bert'], and verify the grafted forward differs from
    the random init and matches the source model's encodings."""
    import numpy as np
    from transformers import BertConfig, FlaxBertModel

    from mage_tpu.models.text_heads import (
        BertTextualHead,
        load_pretrained_bert_params,
    )

    cfg = BertConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16, pad_token_id=0,
    )
    src = FlaxBertModel(cfg, seed=7)
    src.save_pretrained(tmp_path / "tiny_bert")

    head = BertTextualHead(out_dim=24, bert_path=str(tmp_path / "tiny_bert"))
    text = jnp.zeros((2, 10), jnp.int32).at[:, 0].set(1).at[:, 1:6].set(5)
    variables = head.init(jax.random.PRNGKey(0), text, train=False)
    rand_out = head.apply(variables, text, train=False)

    pretrained = load_pretrained_bert_params(str(tmp_path / "tiny_bert"))
    grafted = dict(variables["params"], bert=pretrained)
    out = head.apply({"params": grafted}, text, train=False)
    assert out.shape == (2, 10, 24)
    assert np.abs(np.asarray(out) - np.asarray(rand_out)).max() > 1e-4

    # the grafted hidden states equal the source model's
    src_hidden = src(np.asarray(text), np.asarray(text != 0, np.int32))
    expect = np.asarray(src_hidden.last_hidden_state) @ np.asarray(
        grafted["text_projection_key"]
    )
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_bert_pretrained_torch_checkpoint(tmp_path):
    """load_pretrained_bert_params on a TORCH checkpoint — the actual
    format a reference user has on disk (the reference pulls the torch
    bert-base-uncased from the hub, modules/mage_model.py:136-139). Save a
    tiny torch BertModel, load it through the flax fallback, and pin the
    hidden states against the torch forward."""
    import numpy as np
    import torch
    from transformers import BertConfig, BertModel

    from mage_tpu.models.text_heads import (
        BertTextualHead,
        load_pretrained_bert_params,
    )

    cfg = BertConfig(
        vocab_size=30, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=16, pad_token_id=0,
    )
    torch.manual_seed(3)
    src = BertModel(cfg).eval()
    src.save_pretrained(tmp_path / "tiny_bert_pt", safe_serialization=False)
    assert (tmp_path / "tiny_bert_pt" / "pytorch_model.bin").exists()

    pretrained = load_pretrained_bert_params(str(tmp_path / "tiny_bert_pt"))

    head = BertTextualHead(out_dim=24, bert_path=str(tmp_path / "tiny_bert_pt"))
    text = jnp.zeros((2, 10), jnp.int32).at[:, 0].set(1).at[:, 1:6].set(7)
    variables = head.init(jax.random.PRNGKey(0), text, train=False)
    grafted = dict(variables["params"], bert=pretrained)
    out = head.apply({"params": grafted}, text, train=False)

    with torch.no_grad():
        t_hidden = src(
            torch.from_numpy(np.array(text)).long(),
            attention_mask=torch.from_numpy(np.array(text != 0)).long(),
        ).last_hidden_state.numpy()
    expect = t_hidden @ np.asarray(grafted["text_projection_key"])
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=2e-4)


def test_pid_closed_loop_holds_nonzero_equilibrium_beta():
    """Closed-loop regulation on a responsive plant (the regime the e2e
    cosine-LR schedule cannot reach: there, lr -> 0 freezes the dynamics
    and any correct controller must release beta — see
    docs/results/CAPABILITIES.md item 3). Plant: first-order KL dynamics
    whose free (beta=0) steady state sits ABOVE the setpoint and which
    responds linearly to beta — kl* = kl_free * (1 - c*beta). The
    controller (reference gains kp=0.01, ki=-1e-4,
    mage_model.py:406-434) must drive KL to the setpoint and HOLD a
    nonzero equilibrium beta = (1 - target/kl_free)/c = 0.75."""
    from mage_tpu.training.pid import initial_pid_state, pid_update

    kl_free, c, rate, target, steps = 10.0, 0.8, 0.05, 4.0, 12_000

    # host twin
    pid = PIDControl()
    kl = kl_free
    kls, betas = [], []
    for _ in range(steps):
        b, _ = pid.pid(target, kl)
        kl += rate * (kl_free * (1.0 - c * b) - kl)
        kls.append(kl)
        betas.append(b)
    tail_kl = np.mean(kls[-1000:])
    tail_beta = np.mean(betas[-1000:])
    assert abs(tail_kl - target) < 0.1, tail_kl
    assert 0.5 < tail_beta < 0.95, tail_beta
    assert np.std(betas[-1000:]) < 1e-3  # held, not oscillating
    assert min(betas[-1000:]) > 0.0  # never releases

    # jit twin: the same closed loop as one lax.scan program
    def step(carry, _):
        state, kl = carry
        beta, state = pid_update(state, target, kl)
        kl = kl + rate * (kl_free * (1.0 - c * beta) - kl)
        return (state, kl), (kl, beta)

    (_, kl_end), (kl_tr, beta_tr) = jax.lax.scan(
        step, (initial_pid_state(), jnp.float32(kl_free)), None,
        length=steps,
    )
    assert abs(float(jnp.mean(kl_tr[-1000:])) - tail_kl) < 0.05
    assert abs(float(jnp.mean(beta_tr[-1000:])) - tail_beta) < 0.01
