#!/usr/bin/env python
"""Stage-1 KL-autoencoder training CLI (the MAGE+ first stage).

The reference does NOT train this in-repo: it imports a pretrained
AutoencoderKL from the external `ldm` package (reference:
modules/mage_model.py:437, config/mage+_caterv2.yaml:24-45 with
``lossconfig: torch.nn.Identity``). This CLI closes that gap with a simple
in-framework objective: MSE reconstruction + kl_weight * KL (the LDM
recipe minus its adversarial/perceptual terms), on the same per-frame
datasets as train_vqvae.py.
"""

import argparse
import functools
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="KL autoencoder (TPU-native)")
    p.add_argument("--data-root", type=str, required=True)
    p.add_argument("--dataset", type=str, default="cater_gen", choices=["mnist", "cater_gen"])
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--ch", type=int, default=128)
    p.add_argument("--ch-mult", type=int, nargs="+", default=[1, 2, 4, 4])
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--z-channels", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=4.5e-6)
    p.add_argument("--kl-weight", type=float, default=1e-6)
    p.add_argument("--output-folder", type=str, default="kl_f8_cater")
    p.add_argument("--log-folder", type=str, default="./models/log")
    p.add_argument("--model-folder", type=str, default="./models/autoencoders")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=50)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from mage_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import flax.struct
    import jax
    import jax.numpy as jnp
    import optax

    from mage_tpu.data.loader import Loader
    from mage_tpu.models.autoencoder_kl import AutoencoderKL
    from mage_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from mage_tpu.training.checkpoint import Checkpointer
    from mage_tpu.utils import MetricsWriter, Timer
    from train_vqvae import build_datasets

    train_ds, test_ds, num_channels, _ = build_datasets(args)
    model = AutoencoderKL(
        embed_dim=args.z_channels,
        ch=args.ch,
        ch_mult=tuple(args.ch_mult),
        num_res_blocks=args.num_res_blocks,
        in_channels=num_channels,
        out_ch=num_channels,
        z_channels=args.z_channels,
        resolution=args.resolution,
    )
    mesh = make_mesh()
    tx = optax.adam(args.lr)

    class State(flax.struct.PyTreeNode):
        step: jax.Array
        params: object
        opt_state: object

    sample = jnp.zeros((args.batch_size, args.resolution, args.resolution, num_channels))
    variables = model.init({"params": jax.random.PRNGKey(args.seed)}, sample,
                           jax.random.PRNGKey(0))
    params = variables["params"]
    state = State(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))
    state = jax.device_put(state, replicated_sharding(mesh))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"KL-AE params: {n:,}")

    kl_weight = args.kl_weight

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, images, rng):
        def loss_fn(p):
            recon, post = model.apply({"params": p}, images, rng, train=True)
            rec = jnp.mean((recon - images) ** 2)
            kl = jnp.mean(post.kl())
            return rec + kl_weight * kl, {"reconstruction": rec, "kl": kl}

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(step=state.step + 1,
                          params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state),
            aux,
        )

    @jax.jit
    def eval_step(state, images, rng):
        recon, post = model.apply({"params": state.params}, images, rng)
        return {"reconstruction": jnp.mean((recon - images) ** 2),
                "kl": jnp.mean(post.kl())}

    writer = MetricsWriter(os.path.join(args.log_folder, args.output_folder))
    ckpt = Checkpointer(os.path.join(args.model_folder, args.output_folder))
    if args.resume:
        state = jax.device_put(ckpt.restore(args.resume, jax.device_get(state)),
                               replicated_sharding(mesh))
        print(f"=> loaded checkpoint '{args.resume}'")

    loader = Loader(train_ds, args.batch_size, shuffle=True, seed=args.seed, drop_last=True)
    test_loader = Loader(test_ds, args.batch_size, shuffle=False, drop_last=True)
    rng = np.random.RandomState(args.seed)
    steps, best = 0, None
    timer = Timer(total_iterations=args.num_epochs)
    for epoch in range(args.num_epochs):
        loader.set_epoch(epoch)
        timer.tic()
        for images in loader:
            images = shard_batch(np.asarray(images), mesh)
            state, aux = train_step(state, images, jax.random.PRNGKey(rng.randint(2**31)))
            steps += 1
            if steps % args.log_every == 0:
                writer.add_scalars("loss/train/", {k: float(v) for k, v in
                                                   jax.device_get(aux).items()}, steps)
        timer.toc()
        totals, count = {}, 0
        for images in test_loader:
            images = shard_batch(np.asarray(images), mesh)
            out = jax.device_get(eval_step(state, images, jax.random.PRNGKey(0)))
            for k, v in out.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        mean = {k: v / max(count, 1) for k, v in totals.items()}
        writer.add_scalars("loss/test/", mean, steps)
        print(f"epoch {epoch}, test_recon = {mean['reconstruction']:.6f} | {timer.stats}")
        host = jax.device_get(state)
        if best is None or mean["reconstruction"] < best:
            best = mean["reconstruction"]
            ckpt.save("best", host)
        ckpt.save(f"model_{epoch + 1}", host)


if __name__ == "__main__":
    main()
