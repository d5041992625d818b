#!/usr/bin/env python
"""Stage-2 MAGE training / sampling CLI.

Mirrors the reference's main_mage.py surface (reference:
main_mage.py:29-56,276-297): ``--split train`` trains from a YAML config
(saving a config snapshot next to the checkpoints, :64-67); ``--split
test`` reloads the snapshot from the checkpoint directory and runs
autoregressive sampling, writing GIFs (:201-257).

DDP flags are replaced by the JAX single-controller model (see
train_vqvae.py docstring).
"""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="config/mage_caterv1.yaml")
    p.add_argument("--split", type=str, default="train", choices=["train", "test"])
    p.add_argument("--checkpoint-path", type=str, default="./results/mage")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default="",
                   help="checkpoint name/path to resume training from")
    p.add_argument("--n_samples", type=int, default=1,
                   help="samples to produce per test instance")
    p.add_argument("--test_model", type=str, default="",
                   help="checkpoint dir (containing config.yaml) or name for sampling")
    p.add_argument("--max-test-items", type=int, default=-1)
    p.add_argument("--sample-batch-size", type=int, default=1)
    p.add_argument("--save-gifs", action="store_true", default=True)
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 stage-2 transformer for sampling (~1.4x on "
                        "v5e); the frozen first stage stays f32 so "
                        "conditioning ids match the f32 run")
    p.add_argument("--temperature", type=float, default=0.0,
                   help="stochastic id decoding temperature (0 = greedy "
                        "reference parity; discrete models only)")
    p.add_argument("--top-k", type=int, default=0,
                   help="restrict stochastic decoding to the top-k logits "
                        "(0 = no restriction; needs --temperature > 0)")
    return p.parse_args(argv)


def build(configs, split: str, seed: int):
    from mage_tpu.config import instantiate_from_config

    dataset = instantiate_from_config(configs.data, {"split": split, "seed": seed})
    return dataset


def train(opt):
    import jax

    from mage_tpu.config import instantiate_from_config, load_config, save_config
    from mage_tpu.data.loader import Loader, PrefetchLoader
    from mage_tpu.training.mage_trainer import MageTrainer

    configs = load_config(opt.config)
    os.makedirs(opt.checkpoint_path, exist_ok=True)
    save_config(configs, os.path.join(opt.checkpoint_path, "config.yaml"))

    train_dataset = build(configs, "train", opt.seed)
    test_dataset = build(configs, "test", opt.seed)
    pipeline = instantiate_from_config(configs.model)

    trainer = MageTrainer(
        pipeline, configs.train, opt.checkpoint_path, seed=opt.seed
    )
    n_dev = trainer.mesh.devices.size
    bs = int(configs.train.batchsize)  # global batch size
    if bs % n_dev:
        raise SystemExit(f"batchsize {bs} not divisible by {n_dev} devices")
    n_proc, proc = jax.process_count(), jax.process_index()
    local_bs = bs // n_proc  # per-process share (reference main_mage.py:93)
    base_loader = Loader(train_dataset, local_bs, shuffle=True, seed=opt.seed,
                         drop_last=True, num_shards=n_proc, shard_index=proc)
    # overlap host decode/collate with device steps (1-vCPU host)
    train_loader = PrefetchLoader(base_loader)
    test_loader = Loader(test_dataset, local_bs, shuffle=False, drop_last=True,
                         num_shards=n_proc, shard_index=proc)

    first = next(iter(base_loader))
    trainer.init_state({k: v for k, v in first.items() if k != "video_id"})
    start_epoch = 0
    if opt.resume:
        trainer.resume(opt.resume)
        # resume the LR schedule from the epoch the iteration count implies
        start_epoch = trainer.iteration // max(len(train_loader), 1)
        print(
            f"=> resumed from '{opt.resume}' at iteration {trainer.iteration}"
            f" (epoch {start_epoch})"
        )
    trainer.fit(train_loader, test_loader, start_epoch=start_epoch)


def sampling(opt):
    import jax

    from mage_tpu.config import instantiate_from_config, load_config
    from mage_tpu.data.loader import Loader, PrefetchLoader
    from mage_tpu.training.checkpoint import Checkpointer
    from mage_tpu.utils.media import save_gif

    test_model = opt.test_model or os.path.join(opt.checkpoint_path, "model_best")
    ckpt_dir = os.path.dirname(os.path.abspath(test_model))
    configs = load_config(os.path.join(ckpt_dir, "config.yaml"))
    test_dataset = build(configs, "test", opt.seed)
    pipeline = instantiate_from_config(configs.model)

    ckpt = Checkpointer(ckpt_dir)
    restored = ckpt.restore(os.path.abspath(test_model))
    params = restored["params"]
    print(f"=> loaded checkpoint '{test_model}'")

    # reference sampling uses batch 1 (main_mage.py:205); larger batches
    # amortize the AR loop across the chip (see BENCH_NOTES.md)
    bs = max(1, opt.sample_batch_size)
    loader = Loader(test_dataset, bs, shuffle=True, seed=opt.seed, drop_last=bs > 1)

    import jax.numpy as jnp

    fs_vars = pipeline.first_stage.variables
    compute_dtype = None
    if opt.bf16:
        # stage-2 core in bf16; the frozen first stage STAYS f32 so the VQ
        # argmin yields the same conditioning ids as an f32 run (the same
        # contract as bf16 training, mage_tpu/training/mage_trainer.py)
        from mage_tpu.training.mage_trainer import cast_floating

        params = cast_floating(params, jnp.bfloat16)
        compute_dtype = jnp.bfloat16
    gen = jax.jit(
        lambda p, batch, rng: pipeline.generate(
            p, batch, rng, fs_variables=fs_vars, compute_dtype=compute_dtype,
            temperature=opt.temperature, top_k=opt.top_k,
        )
    )
    rng = jax.random.PRNGKey(opt.seed)
    out_dir = os.path.join(ckpt_dir, "videos")
    done = 0
    for batch in loader:
        if 0 <= opt.max_test_items <= done:
            break
        video_ids = batch.pop("video_id", [f"sample_{done + i}" for i in range(bs)])
        batch = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()}
        for s in range(opt.n_samples):
            rng, step_rng = jax.random.split(rng)
            videos = np.asarray(gen(params, batch, step_rng), np.float32)
            videos = np.clip(videos, -1.0, 1.0)
            if opt.save_gifs:
                for i, video_id in enumerate(video_ids):
                    name = (
                        f"{os.path.splitext(video_id)[0]}-"
                        f"{float(batch['speed'][i]):.4f}"
                    )
                    if opt.n_samples > 1:
                        name += f"-s{s}"
                    save_gif(videos[i], os.path.join(out_dir, name + ".gif"), fps=3)
        done += len(video_ids)
        print(done)


def main(argv=None):
    opt = parse_args(argv)
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if opt.multihost:
        import jax

        jax.distributed.initialize()
    if opt.split == "train":
        train(opt)
    else:
        sampling(opt)


if __name__ == "__main__":
    main()
