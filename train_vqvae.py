#!/usr/bin/env python
"""Stage-1 VQ-VAE training CLI.

Mirrors the reference's train_vqvae.py CLI surface (reference:
train_vqvae.py:184-253): dataset selection (mnist 64px/down4,
cater_gen 128px/down8), Adam(lr), 3-term loss with commitment beta,
per-epoch validation, best/per-epoch checkpoints, reconstruction grids.

The reference's DDP flags (--world-size/--rank/--dist-url/--dist-backend/
--multiprocessing-distributed, :219-224) are replaced by the JAX
single-controller model: the data-parallel mesh is constructed from all
visible devices automatically; multi-host runs only need
``jax.distributed.initialize()`` (no rendezvous URL, no process spawning).
"""

import argparse
import os

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="VQ-VAE (TPU-native)")
    parser.add_argument(
        "--data-root", type=str, default="./data/moving_mnist/mnist_single_20f_10k_"
    )
    parser.add_argument("--dataset", type=str, default="mnist", choices=["mnist", "cater_gen"])
    parser.add_argument("--hidden-size", type=int, default=256)
    parser.add_argument("--k", type=int, default=512)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--num-epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--beta", type=float, default=2.0, help="commitment loss weight")
    parser.add_argument("--output-folder", type=str, default="mnist_512_256")
    parser.add_argument("--log-folder", type=str, default="./models/log")
    parser.add_argument("--model-folder", type=str, default="./models/model")
    parser.add_argument("--resume", type=str, default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--codebook-restart", action="store_true",
                        help="re-seed dead codebook entries each epoch "
                             "(beyond reference: revival insurance against "
                             "codebook collapse)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for multi-host meshes")
    return parser.parse_args(argv)


def build_datasets(args):
    from mage_tpu.data import transforms as T
    from mage_tpu.data.datasets import CATER4VQVAE, MovingMnist4VQVAE

    if args.dataset == "mnist":
        transform = T.Compose(
            [
                T.RandomResizedCrop(64, scale=(0.8, 1.0)),
                T.ToFloat(),
                T.Normalize([0.5], [1.0]),
            ]
        )
        train = MovingMnist4VQVAE(args.data_root, "train", transform, seed=args.seed)
        test = MovingMnist4VQVAE(args.data_root, "test", transform, seed=args.seed)
        return train, test, 1, 4
    transform = T.Compose(
        [
            T.RandomResizedCrop(128, scale=(0.8, 1.0)),
            T.ToFloat(),
            T.Normalize([0.5], [0.5]),
        ]
    )
    train = CATER4VQVAE(args.data_root, "train", transform, seed=args.seed)
    test = CATER4VQVAE(args.data_root, "test", transform, seed=args.seed)
    return train, test, 3, 8


def main(argv=None):
    args = parse_args(argv)
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.multihost:
        import jax

        jax.distributed.initialize()

    from mage_tpu.data.loader import Loader, PrefetchLoader
    from mage_tpu.models.vqvae import VectorQuantizedVAE
    from mage_tpu.training.vqvae_trainer import VQVAETrainer

    train_ds, test_ds, num_channels, down_ratio = build_datasets(args)
    model = VectorQuantizedVAE(
        input_dim=num_channels, down_ratio=down_ratio, dim=args.hidden_size, K=args.k
    )
    trainer = VQVAETrainer(
        model,
        lr=args.lr,
        beta=args.beta,
        log_dir=os.path.join(args.log_folder, args.output_folder),
        ckpt_dir=os.path.join(args.model_folder, args.output_folder),
        seed=args.seed,
        codebook_restart=args.codebook_restart,
    )
    import jax

    n_dev = trainer.mesh.devices.size
    if args.batch_size % n_dev:
        raise SystemExit(f"--batch-size {args.batch_size} not divisible by {n_dev} devices")
    n_proc, proc = jax.process_count(), jax.process_index()
    train_loader = PrefetchLoader(Loader(
        train_ds, args.batch_size // n_proc, shuffle=True, seed=args.seed,
        drop_last=True, num_shards=n_proc, shard_index=proc,
    ))  # overlap host decode/collate with device steps (1-vCPU host)
    eval_bs = min(16 if 16 % n_dev == 0 else n_dev, len(test_ds))
    eval_bs = max((eval_bs // n_dev) * n_dev, n_dev)
    test_loader = Loader(test_ds, eval_bs // n_proc, shuffle=False, drop_last=True,
                         num_shards=n_proc, shard_index=proc)

    fixed = np.stack([test_ds[i] for i in range(min(16, len(test_ds)))])

    sample_shape = (args.batch_size, *np.asarray(train_ds[0]).shape)
    trainer.init_state(sample_shape)
    if args.resume:
        trainer.resume(args.resume)
        print(f"=> loaded checkpoint '{args.resume}'")

    trainer.fit(
        train_loader,
        test_loader,
        args.num_epochs,
        fixed_images=fixed,
        log_every=args.log_every,
    )


if __name__ == "__main__":
    main()
