"""Train a discriminative FVD feature extractor on the offline datasets.

VERDICT r3 missing #3: the canonical FVD extractor is Kinetics-pretrained
I3D, but no such checkpoint ships in this offline image, so every
recorded FVD used a RANDOM-init I3D (shallow Mixed_3c projections — see
evals/i3d.py). Those numbers are only internally comparable and weakly
motion-sensitive. The one offline remedy is to TRAIN the extractor: the
dataset generators carry ground-truth semantics, so this script trains
the in-repo I3D trunk as a multi-label classifier on them and exports
its penultimate (Mixed_4f, 832-d, global-avg) features for FVD.
Supervision forces motion-sensitive features — exactly the property
Kinetics pretraining buys the standard metric (the reference ecosystem's
FVD protocol; the reference repo itself computes no FVD, SURVEY.md §6).

Datasets / label sets:
  --dataset caterv2|caterv1  multi-hot over the four CATER actions
                             (generators/cater_synthetic.py ``movements``)
  --dataset mnist            single Moving MNIST: digit class (10) + motion
                             axis (2) + motion sign (2) one-hots — sign
                             supervision makes the features sensitive to
                             exactly the direction-binding failure the
                             MNIST evals probe

Anti-leakage: trains on scenes drawn from a DIFFERENT generator seed
(default 1000) than any e2e chain's train/val datasets (seed 0).

Calibration demo baked into the eval: alongside val label accuracy it
reports FVD(real-vs-real) across two val halves (the floor) and
FVD(static-vs-real) where "static" clips repeat frame 0 — a degenerate
"generator" any motion-sensitive metric must flag. The trained extractor
should separate static clips by orders of magnitude over the floor;
random Mixed_3c features barely do.

Usage:
    python train_fvd_extractor.py --out runs/fvd_extractor
    python train_fvd_extractor.py --dataset mnist --out runs/fvd_extractor_mnist
    python train_fvd_extractor.py --tiny --out /tmp/fvdx_smoke   # CPU smoke

Checkpoints are auto-discovered by the e2e chains / eval_fvd_e2e via
evals/fvd.py::resolve_extractor (MAGE_FVD_EXTRACTOR, then the default
runs/fvd_extractor{,_mnist} paths, gated on dataset-family match).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from dataclasses import dataclass
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mage_tpu.data import device_data as dd
from mage_tpu.data.generators import cater_synthetic as cs
from mage_tpu.evals.fvd import compute_fvd
from mage_tpu.evals.i3d import I3D, make_extractor
from mage_tpu.training.autoresume import save_last, try_restore_last
from mage_tpu.training.checkpoint import Checkpointer
from mage_tpu.training.lr import epoch_lr

T_STORE = 24  # CATER stored frames (cater_synthetic)
ACTIONS = ("_slide", "_rotate", "_pick_place", "_contain")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="runs/fvd_extractor")
    p.add_argument("--dataset", default="caterv2",
                   choices=["caterv1", "caterv2", "mnist"])
    p.add_argument("--seed", type=int, default=1000,
                   help="generator seed; keep != the e2e chains' seed 0 "
                        "so extractor training never sees eval scenes")
    p.add_argument("--num-train", type=int, default=2000)
    p.add_argument("--num-val", type=int, default=400)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--frames-length", type=int, default=10,
                   help="clip length; matches the e2e chains' eval clips")
    p.add_argument("--chunk", type=int, default=25)
    p.add_argument("--calib-videos", type=int, default=128)
    p.add_argument("--mnist-npz", default=None)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)
    if args.tiny:
        for k, v in dict(num_train=48, num_val=16, epochs=2, batch=4,
                         chunk=2, calib_videos=8, frames_length=6).items():
            if getattr(args, k) == p.get_default(k):
                setattr(args, k, v)
    return args


def log_metrics(out_dir, record):
    record = dict(record, time=time.time())
    with open(os.path.join(out_dir, "metrics.json"), "a") as fp:
        fp.write(json.dumps(record) + "\n")
    print("METRIC", json.dumps(record), flush=True)


class LabelI3D(nn.Module):
    """I3D trunk (truncated at Mixed_4f, globally averaged) + linear
    multi-label head. Only the trunk is exported for FVD."""

    n_labels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = I3D(endpoint="Mixed_4f", name="i3d")(x, train)
        return nn.Dense(self.n_labels, name="head")(feats)


# backwards-compat alias used by tests
class ActionI3D(LabelI3D):
    n_labels: int = len(ACTIONS)


@dataclass
class DatasetSpec:
    """Everything the generic training loop needs about a dataset."""

    tag: str                 # provenance "dataset" family tag
    hw: int                  # frame side
    y_train: jax.Array       # (N, n_labels) multi-hot float32
    y_val: jax.Array
    clips_at: Callable       # (split, (B,) idx, (B, L) pos) -> clips [-1,1]
    positions: Callable      # ((B,) speed, L) -> (B, L) stored-frame ids
    groups: tuple            # ((name, start, end, kind{multi,onehot}), ...)
    label_names: tuple


def action_labels(metas) -> np.ndarray:
    """Scene meta -> multi-hot over ACTIONS (each of the two movers
    performs one action; cater_synthetic.sample_scene ``movements``)."""
    y = np.zeros((len(metas), len(ACTIONS)), np.float32)
    for i, m in enumerate(metas):
        for moves in m["movements"].values():
            for action, _target, _s, _e in moves:
                y[i, ACTIONS.index(action)] = 1.0
    return y


def prepare_cater(args) -> DatasetSpec:
    dataset = "CATER-GEN-v1" if args.dataset == "caterv1" else "CATER-GEN-v2"
    ctx = 32 if args.dataset == "caterv1" else 38
    compact = cs.build_compact_cater(args.num_train, args.num_val, args.seed,
                                     dataset=dataset, context_length=ctx)
    norm = lambda u8: jnp.asarray(u8, jnp.float32) / 127.5 - 1.0  # noqa: E731
    dev = {
        "bank": jnp.concatenate(
            [norm(compact["bank"][..., :3]),
             jnp.asarray(compact["bank"][..., 3:], jnp.float32)], axis=-1),
        "background": norm(compact["background"]),
        "train": {k: jnp.asarray(v) for k, v in compact["train"].items()
                  if k != "meta"},
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()
                if k != "meta"},
    }

    def clips_at(split, idx, pos):
        d = dev[split]
        B, L = pos.shape
        flat_i, flat_t = jnp.repeat(idx, L), pos.reshape(-1)
        frames = dd.compose_frames_cater(
            dev["bank"], dev["background"],
            d["sid"][flat_i, flat_t], d["top"][flat_i, flat_t],
            d["left"][flat_i, flat_t])
        return frames.reshape(B, L, *frames.shape[1:])

    def positions(speed, L):
        # same speed->stored-frame map as train_cater_e2e.clip_positions
        def one(s):
            q = T_STORE / (1.0 + 1.4 * s.astype(jnp.float32))
            count = jnp.maximum(jnp.round(q).astype(jnp.int32), L)
            i = jnp.arange(L, dtype=jnp.int32)
            return (i * (T_STORE - 1)) // jnp.maximum(count - 1, 1)

        return jax.vmap(one)(speed)

    return DatasetSpec(
        tag=dataset, hw=128,
        y_train=jnp.asarray(action_labels(compact["train"]["meta"])),
        y_val=jnp.asarray(action_labels(compact["val"]["meta"])),
        clips_at=clips_at, positions=positions,
        groups=(("action", 0, len(ACTIONS), "multi"),),
        label_names=ACTIONS,
    )


def mnist_motion_labels(split: dict, digit_classes: np.ndarray) -> np.ndarray:
    """(M, 14): digit one-hot (10) + axis one-hot (2: horizontal,
    vertical) + sign one-hot (2: increasing, decreasing coordinate),
    derived from the stored integer trajectories."""
    ys, xs = np.asarray(split["ys"]), np.asarray(split["xs"])
    m = ys.shape[0]
    y = np.zeros((m, 14), np.float32)
    y[np.arange(m), digit_classes] = 1.0
    horizontal = xs.std(axis=1) > ys.std(axis=1)
    y[np.arange(m), 10 + (~horizontal).astype(int)] = 1.0
    moving = np.where(horizontal[:, None], xs, ys)
    delta = moving[:, 1:] - moving[:, :-1]
    # first nonzero step decides the sign (bounce flips later steps)
    first = delta[np.arange(m),
                  np.argmax(np.abs(delta) > 0, axis=1)]
    y[np.arange(m), 12 + (first < 0).astype(int)] = 1.0
    return y


def prepare_mnist(args) -> DatasetSpec:
    from mage_tpu.data.generators import mnist_common as mc

    compact = dd.build_compact_single_mnist(args.num_train, args.num_val,
                                            args.seed, args.mnist_npz)
    _images, bank_labels = mc.load_digit_bank(args.mnist_npz, seed=args.seed)
    bank = dd.normalize_bank(compact["bank"])
    dev = {s: {k: jnp.asarray(v) for k, v in compact[s].items()}
           for s in ("train", "val")}

    def clips_at(split, idx, pos):
        # flat single-level composition (vmapping compose_clip over the
        # clip index nests a second vmap around compose_frames' internal
        # one, which XLA miscompiles under jit; see tests/test_device_data
        # nested-vmap regression). Mirrors prepare_cater's proven shape.
        d = dev[split]
        B, L = pos.shape
        rows, cols = jnp.repeat(idx, L), pos.reshape(-1)
        flat = dd.compose_frames(bank, jnp.repeat(d["digit"][idx], L),
                                 d["ys"][rows, cols], d["xs"][rows, cols])
        clips = flat.reshape(B, L, *flat.shape[1:])
        return jnp.repeat(2.0 * clips, 3, axis=-1)  # [-.5,.5] gray->rgb

    def positions(speed, L):
        return jax.vmap(lambda s: dd.clip_indices(s, frames_length=L))(speed)

    y = {s: mnist_motion_labels(
            compact[s], np.asarray(bank_labels)[compact[s]["digit"]])
         for s in ("train", "val")}
    return DatasetSpec(
        tag="MovingMNIST", hw=64,
        y_train=jnp.asarray(y["train"]), y_val=jnp.asarray(y["val"]),
        clips_at=clips_at, positions=positions,
        groups=(("digit", 0, 10, "onehot"), ("axis", 10, 12, "onehot"),
                ("sign", 12, 14, "onehot")),
        label_names=tuple([f"digit_{i}" for i in range(10)]
                          + ["horizontal", "vertical", "positive",
                             "negative"]),
    )


def group_accuracies(groups, pred_logits: np.ndarray,
                     labels: np.ndarray) -> dict:
    out = {}
    for name, a, z, kind in groups:
        lg, lb = pred_logits[:, a:z], labels[:, a:z]
        if kind == "onehot":
            out[f"val_{name}_acc"] = float(
                np.mean(lg.argmax(-1) == lb.argmax(-1)))
        else:
            out[f"val_{name}_acc"] = float(np.mean((lg > 0) == (lb > 0.5)))
    return out


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    print(f"devices: {jax.devices()}")

    spec = (prepare_mnist if args.dataset == "mnist"
            else prepare_cater)(args)
    y_train, y_val = spec.y_train, spec.y_val
    n_labels = int(y_train.shape[1])
    print(f"dataset {spec.tag}: {n_labels} labels, "
          f"train multi-hot mean {np.asarray(y_train).mean(0).round(3)}")

    model = LabelI3D(n_labels=n_labels)
    L = args.frames_length
    init_fn = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(args.seed)},
        jnp.zeros((1, L, spec.hw, spec.hw, 3)), True))
    variables = init_fn()
    params, batch_stats = variables["params"], variables["batch_stats"]
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"extractor params: {n_par:,}")

    import optax

    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=args.lr)
    opt_state = jax.jit(tx.init)(params)
    n = args.num_train
    b = args.batch

    def loss_fn(params, batch_stats, clips, labels):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, clips, True,
            mutable=["batch_stats"])
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
        return loss, (mutated["batch_stats"], logits)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_chunk(params, batch_stats, opt_state, rng, lr, y):
        def body(carry, _):
            params, batch_stats, opt_state, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            idx = jax.random.randint(k1, (b,), 0, n)
            speed = jax.random.uniform(k2, (b,))
            pos = spec.positions(speed, L)
            clips = spec.clips_at("train", idx, pos)
            grads, (batch_stats, _logits) = jax.grad(
                loss_fn, has_aux=True)(params, batch_stats, clips, y[idx])
            opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr, jnp.float32)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return (params, batch_stats, opt_state, rng), None

        (params, batch_stats, opt_state, _), _ = jax.lax.scan(
            body, (params, batch_stats, opt_state, rng), None,
            length=args.chunk)
        return params, batch_stats, opt_state

    n_val = args.num_val
    eval_b = min(64, n_val)

    @jax.jit
    def eval_batch(params, batch_stats, start):
        idx = start + jnp.arange(eval_b)
        speed = jnp.full((eval_b,), 0.5)
        pos = spec.positions(speed, L)
        clips = spec.clips_at("val", idx, pos)
        return model.apply({"params": params, "batch_stats": batch_stats},
                           clips, False)

    ckpt = Checkpointer(os.path.join(args.out, "i3d"))
    steps_per_epoch = max(n // b, 1)
    chunks = max(round(steps_per_epoch / args.chunk), 1)
    rng = jax.random.PRNGKey(args.seed + 1)
    best = float("inf")
    start_epoch = 0
    resumed = try_restore_last(ckpt, {"params": params, "bs": batch_stats,
                                      "opt_state": opt_state, "rng": rng})
    if resumed is not None:
        start_epoch, best, st = resumed
        params, batch_stats = st["params"], st["bs"]
        opt_state, rng = st["opt_state"], st["rng"]
        print(f"autoresume: epoch {start_epoch}, best {best:.4f}")
    y_val_np = np.asarray(y_val)

    def val_metrics():
        logits = np.asarray(jax.device_get(
            eval_batch(params, batch_stats, jnp.int32(0))))
        labels = y_val_np[:eval_b]
        per_label = float(np.mean((logits > 0) == (labels > 0.5)))
        exact = float(np.mean(np.all((logits > 0) == (labels > 0.5), -1)))
        return per_label, exact, group_accuracies(spec.groups, logits, labels)

    # a relaunch after a completed run (start_epoch == epochs) skips the
    # loop entirely; provenance.json below still needs these
    per_label, exact, metrics = val_metrics()
    t0 = time.time()
    for epoch in range(start_epoch, args.epochs):
        lr = epoch_lr(args.lr, epoch, args.epochs, cos=True)
        for _ in range(chunks):
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state = train_chunk(
                params, batch_stats, opt_state, sub, lr, y_train)
        per_label, exact, metrics = val_metrics()
        score = 1.0 - exact  # best-tracking proxy
        log_metrics(args.out, {
            "phase": "extractor", "epoch": epoch, "lr": lr,
            "val_action_acc_per_label": per_label,
            "val_action_acc_exact_set": exact, **metrics,
            "sec_per_epoch": (time.time() - t0) / (epoch - start_epoch + 1),
        })
        if score < best:
            best = score
            ckpt.save("best", {"params": jax.device_get(params["i3d"]),
                               "batch_stats": jax.device_get(
                                   batch_stats["i3d"])})
        save_last(ckpt, epoch, best, {"params": params, "bs": batch_stats,
                                      "opt_state": opt_state, "rng": rng})

    # ---- calibration: trained Mixed_4f vs random Mixed_3c ----------------
    trunk = {"params": jax.device_get(params["i3d"]),
             "batch_stats": jax.device_get(batch_stats["i3d"])}
    m = min(args.calib_videos, n_val)
    idx = jnp.arange(m)
    speed = jnp.full((m,), 0.5)
    pos = spec.positions(speed, L)
    real = np.asarray(jax.device_get(
        jax.jit(lambda: spec.clips_at("val", idx, pos))()))
    half = m // 2
    static = np.repeat(real[half:, :1], L, axis=1)  # degenerate "generator"

    rows = {}
    for name, extractor in (
        ("trained_Mixed_4f", make_extractor(trunk, batch_size=4,
                                            endpoint="Mixed_4f")),
        ("random_Mixed_3c", make_extractor(
            I3D(endpoint="Mixed_3c").init(
                jax.random.PRNGKey(42), jnp.zeros((1, 2, 32, 32, 3))),
            batch_size=4, endpoint="Mixed_3c")),
    ):
        floor = compute_fvd(real[:half], real[half:], extractor)
        static_fvd = compute_fvd(real[:half], static, extractor)
        rows[name] = {"floor": floor, "static": static_fvd,
                      "static_over_floor": static_fvd / max(floor, 1e-9)}
    log_metrics(args.out, {"phase": "calibration", "samples": m, **rows})

    with open(os.path.join(args.out, "provenance.json"), "w") as fp:
        json.dump({
            "kind": "label-trained I3D trunk, endpoint Mixed_4f (832-d)",
            "dataset": spec.tag, "generator_seed": args.seed,
            "num_train_scenes": args.num_train, "epochs": args.epochs,
            "labels": list(spec.label_names),
            "val_action_acc_per_label": per_label,
            "val_action_acc_exact_set": exact, **metrics,
            "calibration": rows,
        }, fp, indent=1)
    print("saved", os.path.join(args.out, "i3d", "best"))


if __name__ == "__main__":
    main()
