"""Stage-1 VQ-VAE trainer: jitted data-parallel train/eval steps + loop.

Loss and loop parity with reference train_vqvae.py:

- 3-term loss: MSE recon + MSE(z_q_bar, sg z_e) + beta * MSE(z_e, sg z_q_bar)
  (:20-27, beta default 2.0 at :206-207).
- per-epoch validation (recon + vq losses) with cross-device averaging
  (:37-60 — there via dist.all_reduce; here the jitted mean over the
  globally-sharded batch is already the all-reduce).
- best + per-epoch checkpoints (:174-182), fixed-batch reconstruction
  grids (:154-172).

TPU-native: one jitted ``train_step`` under a Mesh — params/opt_state
replicated, batch sharded on ``data``; XLA inserts the gradient psum.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.utils import MetricsWriter, Timer


class VQVAETrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_state(model: VectorQuantizedVAE, rng: jax.Array, sample: jax.Array, tx):
    variables = model.init(rng, sample, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return VQVAETrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_tx(lr: float = 1e-4):
    """Adam with an injectable learning rate (reference uses plain Adam at
    train_vqvae.py:107; lr is schedule-free there, kept injectable here)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def loss_terms(model, params, batch_stats, images, beta, train=True):
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        images,
        train=train,
        mutable=["batch_stats"] if train else [],
    )
    x_tilde, z_e, z_q_bar = out
    loss_recons = jnp.mean((x_tilde - images) ** 2)
    loss_vq = jnp.mean((z_q_bar - jax.lax.stop_gradient(z_e)) ** 2)
    loss_commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q_bar)) ** 2)
    loss = loss_recons + loss_vq + beta * loss_commit
    aux = {
        "reconstruction": loss_recons,
        "quantization": loss_vq,
        "commitment": loss_commit,
        "total": loss,
    }
    return loss, (mutated, aux)


def make_train_step(model: VectorQuantizedVAE, tx, beta: float, mesh):
    @functools.partial(
        jax.jit,
        donate_argnums=(0,),
    )
    def train_step(state: VQVAETrainState, images, lr):
        def loss_fn(params):
            return loss_terms(model, params, state.batch_stats, images, beta, True)

        grads, (mutated, aux) = jax.grad(loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=mutated.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
        )
        return new_state, aux

    return train_step


def make_restart_dead_codes(model: VectorQuantizedVAE):
    """Dead-codebook-entry restart (OPT-IN; the reference has no revival
    mechanism and MNIST-scale runs collapse to ~7/512 active codes —
    BENCH_NOTES.md "Trained-to-quality"). Classic k-means++-style revival:
    encode a probe batch, histogram the selected ids, and re-seed every
    code whose usage count is zero to a random encoder output (+ tiny
    noise so simultaneous restarts stay distinct). Exact no-op for codes
    in use; leaves optimizer moments untouched (the next gradient step
    re-estimates them)."""

    @jax.jit
    def restart(state: VQVAETrainState, images, rng):
        from mage_tpu.ops.vq import nearest_codebook_indices

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        # encoder features at the pre-VQ point: ONE train-mode forward, and
        # ids derived from that same z_e. (An earlier version took ids from
        # an eval-mode ``encode`` pass: its BatchNorm running averages —
        # uncalibrated early in training, CLAUDE.md "Debugging lessons" —
        # can select a different code subset than the train-mode features
        # actually hitting the codebook, mis-marking live codes as dead and
        # repeatedly re-seeding them.)
        _, z_e, _ = model.apply(variables, images, train=True,
                                mutable=["batch_stats"])[0]
        codebook = state.params["codebook"]
        k, d = codebook.shape
        ids = nearest_codebook_indices(z_e.reshape(-1, d), codebook)
        counts = jnp.zeros((k,), jnp.int32).at[ids.reshape(-1)].add(1)
        dead = counts == 0
        feats = z_e.reshape(-1, d)
        rng_pick, rng_noise = jax.random.split(rng)
        pick = jax.random.randint(rng_pick, (k,), 0, feats.shape[0])
        noise = 0.01 * jax.random.normal(rng_noise, (k, d), codebook.dtype)
        seeds = feats[pick].astype(codebook.dtype) + noise
        new_codebook = jnp.where(dead[:, None], seeds, codebook)
        params = dict(state.params, codebook=new_codebook)
        return state.replace(params=params), jnp.sum(dead)

    return restart


def make_eval_step(model: VectorQuantizedVAE, beta: float):
    @jax.jit
    def eval_step(state: VQVAETrainState, images):
        # Reference test() never flips to eval mode (train_vqvae.py:37-44):
        # BN uses batch statistics during validation. We match that but do
        # not let validation mutate the running averages.
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        x_tilde, z_e, z_q_bar = out
        return {
            "reconstruction": jnp.mean((x_tilde - images) ** 2),
            "quantization": jnp.mean((z_q_bar - z_e) ** 2),
        }

    return eval_step


def make_reconstruct(model: VectorQuantizedVAE):
    @jax.jit
    def reconstruct(state: VQVAETrainState, images):
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        return out[0]

    return reconstruct


class VQVAETrainer:
    def __init__(
        self,
        model: VectorQuantizedVAE,
        lr: float = 1e-4,
        beta: float = 2.0,
        mesh=None,
        log_dir: str = "./logs/vqvae",
        ckpt_dir: str = "./models/vqvae",
        seed: int = 0,
        codebook_restart: bool = False,
    ):
        self.model = model
        self.beta = beta
        self.lr = lr
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = make_tx(lr)
        self.writer = MetricsWriter(log_dir)
        self.ckpt = Checkpointer(ckpt_dir)
        self.seed = seed
        self.train_step = make_train_step(model, self.tx, beta, self.mesh)
        self.eval_step = make_eval_step(model, beta)
        self.reconstruct = make_reconstruct(model)
        # opt-in dead-code revival (off = reference parity; see
        # make_restart_dead_codes)
        self.codebook_restart = codebook_restart
        self.restart_dead = (
            make_restart_dead_codes(model) if codebook_restart else None
        )
        self.state: Optional[VQVAETrainState] = None
        self.steps = 0

    def init_state(self, sample_shape) -> VQVAETrainState:
        sample = jnp.zeros(sample_shape, jnp.float32)
        state = create_state(self.model, jax.random.PRNGKey(self.seed), sample, self.tx)
        self.state = jax.device_put(state, replicated_sharding(self.mesh))
        return self.state

    def resume(self, name_or_path: str) -> None:
        assert self.state is not None, "init_state first"
        restored = self.ckpt.restore(name_or_path, self.state)
        self.state = jax.device_put(restored, replicated_sharding(self.mesh))

    def fit(
        self,
        train_loader,
        test_loader,
        num_epochs: int,
        fixed_images: Optional[np.ndarray] = None,
        log_every: int = 50,
    ) -> float:
        if self.state is None:
            first = next(iter(train_loader))
            self.init_state(np.asarray(first).shape)
        best_loss = None
        timer = Timer(total_iterations=num_epochs)
        if fixed_images is not None:
            self.writer.add_image_grid("original", fixed_images, 0)
        for epoch in range(num_epochs):
            train_loader.set_epoch(epoch)
            timer.tic()
            for images in train_loader:
                images = shard_batch(np.asarray(images), self.mesh)
                self.state, aux = self.train_step(self.state, images, self.lr)
                self.steps += 1
                if self.steps % log_every == 0:
                    aux = jax.device_get(aux)
                    self.writer.add_scalars(
                        "loss/train/", {k: float(v) for k, v in aux.items()}, self.steps
                    )
            if self.restart_dead is not None:
                # probe = the epoch's last batch; codes it never selects
                # get re-seeded to random encoder outputs
                self.state, n_dead = self.restart_dead(
                    self.state, images,
                    jax.random.PRNGKey(self.seed * 100003 + epoch),
                )
                self.writer.add_scalar(
                    "codebook/restarted", int(jax.device_get(n_dead)), self.steps
                )
            timer.toc()

            losses = self.evaluate(test_loader)
            self.writer.add_scalars("loss/test/", losses, self.steps)
            print(
                f"epoch {epoch}, test_recon = {losses['reconstruction']:.6f} | {timer.stats}"
            )

            if fixed_images is not None:
                recon = np.asarray(
                    self.reconstruct(self.state, shard_batch(fixed_images, self.mesh))
                )
                self.writer.add_image_grid("reconstruction", recon, epoch + 1)

            total = losses["reconstruction"]
            if best_loss is None or total < best_loss:
                best_loss = total
                self.ckpt.save("best", jax.device_get(self.state))
            self.ckpt.save(f"model_{epoch + 1}", jax.device_get(self.state))
        return best_loss if best_loss is not None else float("nan")

    def evaluate(self, loader) -> dict:
        totals: dict[str, float] = {}
        count = 0
        for images in loader:
            images = shard_batch(np.asarray(images), self.mesh)
            out = jax.device_get(self.eval_step(self.state, images))
            for k, v in out.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        if count == 0:
            return {"reconstruction": float("nan"), "quantization": float("nan")}
        return {k: v / count for k, v in totals.items()}
