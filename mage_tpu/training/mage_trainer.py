"""Stage-2 MAGE trainer: fused jitted train step (first-stage encode +
teacher-forced forward + Adam update) under a data-parallel mesh.

Loop parity with reference main_mage.py:58-199:

- Adam(lr, betas=(0.9, 0.98), eps=1e-6) (:121), per-epoch cosine or
  milestone LR (:140, 265-274).
- scalar logging per iteration with the reference's ``train/``/``val/``
  tag names (:158-161; loss_dict built in mage_model.py:616-637).
- every ``checkpoint_every`` iterations: full validation pass,
  cross-device mean (the jitted mean over the sharded batch replaces
  dist.barrier+all_reduce, :180-182), ``iteration_N`` + ``model_best``
  checkpoints (:189-199) — plus a real resume path (the reference has
  none for stage 2, :122).
- MAGE+ auto-beta: the PID controller runs INSIDE the jitted step —
  beta_t is computed from step t's KL and weights step t's loss, the
  reference's exact same-step semantics (mage_model.py:628-631); the
  three controller scalars ride along as a traced (3,) array.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mage_tpu.models.pipeline import MagePipeline
from mage_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.lr import epoch_lr
from mage_tpu.training.pid import initial_pid_state
from mage_tpu.utils import MetricsWriter, Timer


class MageTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def make_mage_tx():
    return optax.inject_hyperparams(
        functools.partial(optax.adam, b1=0.9, b2=0.98, eps=1e-6)
    )(learning_rate=1e-4)


def cast_floating(tree, dtype):
    """Cast f32 leaves to ``dtype`` (mixed-precision compute copies;
    integer ids, counters, and non-f32 leaves pass through)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


def make_mage_train_step(pipeline: MagePipeline, tx, compute_dtype=None):
    """``compute_dtype=jnp.bfloat16`` enables mixed precision: master
    params and the Adam state stay f32; the forward/backward runs on bf16
    copies of params + batch (2x MXU throughput for the conv/matmul-bound
    step), while every loss reduction stays f32 (casts in MAGECore) — so
    gradients come back f32 through the cast points. The frozen first
    stage stays f32: its VQ argmin must produce the same ids either way."""
    randomness = pipeline.randomness
    auto_beta = pipeline.auto_beta
    v_kl = pipeline.v_kl

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: MageTrainState, fs_vars, batch, lr, beta, alpha, rng):
        """``beta``: fixed scalar, or — when auto_beta — the (3,) PID
        controller state; the controller then runs in-step on this step's
        KL and the updated state comes back as ``terms['_pid_state']``."""
        def loss_fn(params):
            if compute_dtype is not None:
                params = cast_floating(params, compute_dtype)
            # inputs cast AFTER the frozen f32 first-stage encode inside
            # loss_terms — VQ conditioning ids must match the f32 run
            terms = pipeline.loss_terms(
                params, batch, rng, train=True, fs_variables=fs_vars,
                compute_dtype=compute_dtype,
            )
            final = terms["prediction"]
            if randomness:
                if auto_beta:
                    # same-step auto-beta (reference mage_model.py:628-631):
                    # beta_t = PID(kl_t) weights THIS step's loss. The
                    # controller sees a stopped KL and beta enters the loss
                    # as a constant — d(final)/d(kl) = beta_t, exactly the
                    # reference where beta is a host float.
                    from mage_tpu.training.pid import pid_update

                    beta_t, new_pid = pid_update(
                        beta, v_kl,
                        jax.lax.stop_gradient(terms["kl_loss"]).astype(
                            jnp.float32
                        ),
                    )
                    final = final + jax.lax.stop_gradient(beta_t).astype(
                        final.dtype
                    ) * terms["kl_loss"]
                    terms["beta"] = beta_t
                    terms["_pid_state"] = new_pid
                else:
                    final = final + beta * terms["kl_loss"]
                    final = final + alpha * terms.get("speed_l2", 0.0)
            terms["final_loss"] = final
            return final, terms

        grads, terms = jax.grad(loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt_state
            ),
            terms,
        )

    return train_step


def make_mage_eval_step(pipeline: MagePipeline, compute_dtype=None,
                        test_flag: bool = False):
    """``test_flag=True`` evaluates under PRIOR sampling of the stochastic
    branch (the reference test()-time behavior, mage_model.py:604-605);
    False matches the reference's validation loop (posterior sampling)."""
    randomness = pipeline.randomness
    auto_beta = pipeline.auto_beta

    @jax.jit
    def eval_step(state: MageTrainState, fs_vars, batch, beta, alpha, rng):
        params = state.params
        if compute_dtype is not None:
            params = cast_floating(params, compute_dtype)
        terms = pipeline.loss_terms(
            params, batch, rng, train=False, test_flag=test_flag,
            fs_variables=fs_vars, compute_dtype=compute_dtype,
        )
        final = terms["prediction"]
        if randomness:
            final = final + beta * terms["kl_loss"]
            if not auto_beta:
                final = final + alpha * terms.get("speed_l2", 0.0)
        terms["final_loss"] = final
        return terms

    return eval_step


class MageTrainer:
    def __init__(
        self,
        pipeline: MagePipeline,
        train_cfg,
        checkpoint_path: str,
        mesh=None,
        seed: int = 0,
    ):
        self.pipeline = pipeline
        self.cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.tx = make_mage_tx()
        # train.bf16: true -> mixed-precision step (see make_mage_train_step)
        compute_dtype = jnp.bfloat16 if bool(train_cfg.get("bf16", False)) else None
        self.train_step = make_mage_train_step(pipeline, self.tx, compute_dtype)
        self.eval_step = make_mage_eval_step(pipeline, compute_dtype)
        self.ckpt = Checkpointer(checkpoint_path)
        self.writer = MetricsWriter(checkpoint_path)
        self.seed = seed
        self.state: Optional[MageTrainState] = None
        self.fs_vars = jax.device_put(
            pipeline.first_stage.variables, replicated_sharding(self.mesh)
        )
        # auto-beta: the PID runs in-step (see make_mage_train_step);
        # the trainer carries only the controller state [i_k1, w_k1, e_k1]
        # and mirrors the latest beta on the host for eval/logging/resume
        # (PIDControl, the host-side twin, lives on for tests/host loops)
        self.pid_state = initial_pid_state() if pipeline.auto_beta else None
        self.beta = pipeline.beta if not pipeline.auto_beta else 0.0
        self.iteration = 0
        self.best_loss = float("inf")

    def _place_params(self, params):
        """Parameter placement policy: TP (Megatron column/row) when the
        mesh has a model axis, optionally composed with FSDP over the data
        axis (``train.fsdp: true`` — ZeRO-3 param+opt sharding); replicated
        otherwise. The optimizer state inherits the shardings through the
        jitted init, so Adam moments are sharded exactly like their params."""
        fsdp = bool(self.cfg.get("fsdp", False))
        if self.mesh.shape.get("model", 1) > 1 or (
            fsdp and self.mesh.shape.get("data", 1) > 1
        ):
            from mage_tpu.parallel.partitioning import shard_params

            return shard_params(
                params, self.mesh, fsdp_axis="data" if fsdp else None,
                fsdp_min_size=self.cfg.get("fsdp_min_size", None),
            )
        return jax.device_put(params, replicated_sharding(self.mesh))

    def init_state(self, sample_batch) -> MageTrainState:
        params = self.pipeline.init(jax.random.PRNGKey(self.seed), sample_batch)
        params = self._place_params(params)
        opt_state = jax.jit(self.tx.init)(params)
        state = MageTrainState(
            step=jax.device_put(
                jnp.zeros((), jnp.int32), replicated_sharding(self.mesh)
            ),
            params=params,
            opt_state=opt_state,
        )
        self.state = state
        n = sum(x.size for x in jax.tree_util.tree_leaves(params))
        print(f"stage-2 params: {n:,}")
        return self.state

    def resume(self, name_or_path: str) -> None:
        assert self.state is not None
        restored = self.ckpt.restore(name_or_path, self.state)
        # re-place with the live state's shardings (TP/FSDP placements
        # survive a resume; a bare device_put to replicated would undo them)
        shardings = jax.tree_util.tree_map(lambda x: x.sharding, self.state)
        self.state = jax.device_put(restored, shardings)
        self.iteration = int(self.state.step)
        # host-side state (PID controller, beta, best loss) travels in a
        # sidecar json so auto-beta resumes where it left off
        sidecar = os.path.join(self.ckpt.directory, "trainer_state.json")
        if os.path.exists(sidecar):
            with open(sidecar) as fp:
                host = json.load(fp)
            self.best_loss = host.get("best_loss", self.best_loss)
            self.beta = host.get("beta", self.beta)
            if self.pid_state is not None and "pid" in host:
                self.pid_state = jnp.asarray(
                    [host["pid"]["i_k1"], host["pid"]["w_k1"],
                     host["pid"]["e_k1"]], jnp.float32
                )

    def _save_host_state(self) -> None:
        host = {"iteration": self.iteration, "best_loss": self.best_loss,
                "beta": self.beta}
        if self.pid_state is not None:
            i_k1, w_k1, e_k1 = map(float, jax.device_get(self.pid_state))
            host["pid"] = {"i_k1": i_k1, "w_k1": w_k1, "e_k1": e_k1}
        with open(os.path.join(self.ckpt.directory, "trainer_state.json"), "w") as fp:
            json.dump(host, fp)

    def _prep(self, batch: dict) -> dict:
        batch = {k: v for k, v in batch.items() if k != "video_id"}
        return shard_batch(batch, self.mesh)

    def fit(self, train_loader, test_loader, start_epoch: int = 0) -> None:
        cfg = self.cfg
        epochs = int(cfg.get("epoch", 1))
        checkpoint_every = int(cfg.get("checkpoint_every", 500))
        timer = Timer(start_from=self.iteration + 1)
        rng = np.random.RandomState(self.seed)
        for epoch in range(start_epoch, epochs):
            train_loader.set_epoch(epoch)
            lr = epoch_lr(
                float(cfg.get("lr", 5e-5)),
                epoch,
                epochs,
                cos=bool(cfg.get("cos", True)),
                lr_steps=cfg.get("lr_steps", []),
                lr_gamma=float(cfg.get("lr_gamma", 0.1)),
            )
            self.writer.add_scalar("learning_rate", lr, self.iteration)
            for batch in train_loader:
                if self.state is None:
                    self.init_state(batch)
                timer.tic()
                step_rng = jax.random.PRNGKey(rng.randint(2**31))
                self.state, terms = self.train_step(
                    self.state,
                    self.fs_vars,
                    self._prep(batch),
                    lr,
                    self.pid_state if self.pid_state is not None else self.beta,
                    self.pipeline.alpha,
                    step_rng,
                )
                self.iteration += 1
                if self.pid_state is not None:
                    self.pid_state = terms.pop("_pid_state")
                host_terms = {
                    k: float(v) for k, v in jax.device_get(terms).items()
                }
                timer.toc()
                if self.pid_state is not None:
                    # host mirror of the in-step beta (eval/logging/resume)
                    self.beta = host_terms["beta"]
                self.writer.add_scalars("loss/train/", host_terms, self.iteration)
                if self.iteration % 50 == 0:
                    print(
                        f"iter {self.iteration} (epoch {epoch}), "
                        f"train_loss = {host_terms['final_loss']:.6f} | {timer.stats}"
                    )
                if self.iteration % checkpoint_every == 0:
                    self.validate_and_checkpoint(test_loader, epoch)

    def validate_and_checkpoint(self, test_loader, epoch: int) -> float:
        totals, count = {}, 0
        rng = jax.random.PRNGKey(self.seed + 1)
        for batch in test_loader:
            rng, step_rng = jax.random.split(rng)
            terms = jax.device_get(
                self.eval_step(
                    self.state,
                    self.fs_vars,
                    self._prep(batch),
                    self.beta,
                    self.pipeline.alpha,
                    step_rng,
                )
            )
            for k, v in terms.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            count += 1
        mean = {k: v / max(count, 1) for k, v in totals.items()}
        test_loss = mean.get("final_loss", float("nan"))
        print(f"iteration {self.iteration} (epoch {epoch}), test_loss = {test_loss:.6f}")
        self.writer.add_scalars("loss/val/", mean, self.iteration)
        host_state = jax.device_get(self.state)
        self.ckpt.save(f"iteration_{self.iteration}", host_state)
        if test_loss < self.best_loss:
            self.best_loss = test_loss
            self.ckpt.save("model_best", host_state)
        self._save_host_state()
        return test_loss
