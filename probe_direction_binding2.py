"""CPU probe: per-digit direction binding in the Modified Double MNIST model.

The mnist2 eval's `initial_direction_acc` scores generated motion against
the GROUND-TRUTH trajectory, whose initial direction equals the caption's —
so a model that infers direction from anything correlated with the prime
frame, or simply hedges, is not separated from one that READS the caption.
This probe is generative and counterfactual, the double-digit analogue of
probe_direction_binding.py: AR-generate from the SAME first frame under

  (a) the true caption,
  (b) the sign-swapped caption  (up<->down, left<->right per clause),
  (c) the axis-swapped caption  (up<->left, down<->right per clause),

then template-track EACH captioned digit (train_mnist2_e2e.track_digit)
and test whether its initial displacement follows its OWN clause's first
direction word. A direction-bound model keeps axis+sign agreement high in
all three columns; a caption-blind model produces near-identical videos
(pairwise MSE ~0) and swapped-column agreement at chance (~25% axis+sign).

Counterfactual feasibility: a swapped command can point a digit at an
adjacent wall (stop-at-wall physics would freeze it immediately even under
perfect binding), so digit-cases with < --min-room px of head-room along
the commanded direction are excluded per column.

Reference capability under test: each clause's direction word is the only
source of that digit's initial motion
(/root/reference/data/mnist_caption_double_modified.py:74-139,182-190).
"""
import argparse
import os

if os.environ.get("JAX_PLATFORMS") is None:
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax
import jax.numpy as jnp
import numpy as np

import mage_tpu.data.device_data as dd
import mage_tpu.training.vqvae_trainer as vt
from mage_tpu.models.vqvae import VectorQuantizedVAE
from mage_tpu.training.checkpoint import Checkpointer

# MNIST_VOCAB direction tokens -> screen motion (y grows downward):
# up = -y, down = +y, left = -x, right = +x  (mnist_double_modified.py:31-77)
DIR_TOKENS = {24: (-1, 0), 25: (1, 0), 26: (0, -1), 27: (0, 1)}
SIGN_SWAP = {24: 25, 25: 24, 26: 27, 27: 26}
AXIS_SWAP = {24: 26, 26: 24, 25: 27, 27: 25}
AND_TOKEN = 15


def swap_tokens(text: np.ndarray, mapping: dict) -> np.ndarray:
    out = text.copy()
    for a, b in mapping.items():
        out[text == a] = b
    return out


def clause_directions(text_row: np.ndarray):
    """First direction word of each digit's clause -> [(dy, dx), (dy, dx)].

    Captions are 'the digit D is moving <phrase> and the digit D is moving
    <phrase> .'; the single 'and' (token 15) separates the clauses (compound
    phrases use 'then', token 28). Returns None entries if a clause has no
    direction token (malformed row)."""
    toks = [int(t) for t in text_row]
    split = toks.index(AND_TOKEN) if AND_TOKEN in toks else len(toks)
    out = []
    for seg in (toks[:split], toks[split:]):
        d = next((DIR_TOKENS[t] for t in seg if t in DIR_TOKENS), None)
        out.append(d)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/mnist2_e2e")
    ap.add_argument("--ckpt", default="final")
    ap.add_argument("--videos", type=int, default=24)
    ap.add_argument("--frames", type=int, default=1,
                    help="initial generated frames over which direction is "
                         "measured. GT motion is ~9 px/frame at speed 0.5 "
                         "and 'X then Y' phrases REFLECT at the commanded "
                         "wall, so wide windows corrupt the sign — the "
                         "gt_ceiling line validates the choice")
    ap.add_argument("--min-room", type=int, default=12,
                    help="px of head-room required along the commanded "
                         "direction for a digit-case to count")
    ap.add_argument("--ceiling-only", action="store_true",
                    help="only compute the measurement ceiling (the same "
                         "window/gating/tracker on GT pixel clips); no model")
    args = ap.parse_args(argv)

    from train_mnist2_e2e import build_pipeline, parse_args, track_digit

    targs = parse_args(["--out", args.run])
    compact = dd.build_compact_double_modified(
        targs.num_train, targs.num_val, targs.seed, targs.mnist_npz
    )
    dev = {
        "bank": dd.normalize_bank(compact["bank"]),
        "val": {k: jnp.asarray(v) for k, v in compact["val"].items()},
    }
    d = dev["val"]
    G = args.videos
    L = targs.frames_length
    text_true = np.asarray(d["text"][:G])
    bank_np = np.asarray(jax.device_get(dev["bank"]))
    host = {k: np.asarray(jax.device_get(v)) for k, v in d.items()
            if k != "text"}
    span = dd.IMAGE_SIZE - dd.DIGIT_SIZE  # valid top-left range [0, span]
    K = args.frames

    def score(name, txt, vids):
        """vids (G, L-1, 64, 64) frames 1..L-1; per-digit agreement of the
        initial tracked displacement with txt's clause direction words."""
        ok_axis = ok_sign = n_axis_ok = n = skipped = 0
        for g in range(G):
            dirs = clause_directions(txt[g])
            for ci, (dkey, ykey, xkey) in enumerate(
                (("d1", "ys1", "xs1"), ("d2", "ys2", "xs2"))
            ):
                want = dirs[ci]
                if want is None:
                    continue
                y0 = int(host[ykey][g, 0])
                x0 = int(host[xkey][g, 0])
                if want[0] != 0:
                    room = (span - y0) if want[0] > 0 else y0
                else:
                    room = (span - x0) if want[1] > 0 else x0
                if room < args.min_room:
                    skipped += 1
                    continue
                tmpl_d = bank_np[host[dkey][g]]
                tr = track_digit(vids[g], tmpl_d)  # (L-1, 2)
                dy = float(tr[K - 1, 0] - y0)
                dx = float(tr[K - 1, 1] - x0)
                axis_is_y = abs(dy) >= abs(dx)
                want_y = want[0] != 0
                ok_axis += int(axis_is_y == want_y)
                comp = dy if want_y else dx
                want_sign = want[0] if want_y else want[1]
                if axis_is_y == want_y:
                    n_axis_ok += 1
                    ok_sign += int(np.sign(comp) == want_sign)
                n += 1
        print(f"{name:10s}: axis agreement {ok_axis}/{n} "
              f"({100*ok_axis/max(n,1):.0f}%), sign given axis "
              f"{ok_sign}/{n_axis_ok} ({100*ok_sign/max(n_axis_ok,1):.0f}%), "
              f"{skipped} wall-blocked cases excluded")

    # measurement ceiling: identical window/gating/tracker on GT pixel
    # clips at the probe's speed — validates (frames, min-room) before any
    # model conclusion is drawn
    from train_mnist2_e2e import frames_at

    pos = jax.vmap(
        lambda ln: dd.clip_indices_var(jnp.float32(0.5), ln, L)
    )(d["length"][:G])
    # flat single-level composition (vmapping clip_pixels over the clip
    # index nests a second vmap around compose_frames_double's internal
    # one, which XLA miscompiles under jit; see tests/test_device_data.py
    # nested-vmap regression)
    gt_flat = frames_at(dev, "val", jnp.repeat(jnp.arange(G), L),
                        pos.reshape(-1))
    gt = gt_flat.reshape(G, L, *gt_flat.shape[1:])
    score("gt_ceiling", text_true,
          np.asarray(jax.device_get(gt))[:, 1:, ..., 0])
    if args.ceiling_only:
        return

    model = VectorQuantizedVAE(input_dim=1, down_ratio=4,
                               dim=targs.dim, K=targs.codebook)
    state = vt.create_state(model, jax.random.PRNGKey(targs.seed),
                            jnp.zeros((1, 64, 64, 1)), vt.make_tx(targs.lr1))
    state = Checkpointer(os.path.join(args.run, "vqvae")).restore("best", state)
    fs_vars = {"params": state.params, "batch_stats": state.batch_stats}
    pipeline = build_pipeline(targs, fs_vars)
    ctx = pipeline.core.text_context_length
    tmpl = jax.jit(
        lambda: pipeline.core.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0),
             "latent": jax.random.PRNGKey(0)},
            jnp.zeros((1, L, 16, 16), jnp.int32),
            jnp.zeros((1, ctx), jnp.int32),
            jnp.zeros((1,), jnp.float32), train=True)["params"]
    )()
    restored = Checkpointer(os.path.join(args.run, "mage")).restore(
        args.ckpt, {"step": jnp.zeros((), jnp.int32),
                    "params": jax.device_get(tmpl)})
    params = jax.device_put(restored["params"])
    print("restored", args.run, args.ckpt)

    variants = {
        "true": text_true,
        "sign_swap": swap_tokens(text_true, SIGN_SWAP),
        "axis_swap": swap_tokens(text_true, AXIS_SWAP),
    }
    texts = jnp.asarray(np.concatenate(list(variants.values())))  # (3G, ctx)
    V = len(variants)

    @jax.jit
    def run(params, texts):
        # same prime frame for all variants: GT frame 0 encoded to ids
        f0 = dd.compose_frames_double(
            dev["bank"], d["d1"][:G], d["ys1"][:G, 0], d["xs1"][:G, 0],
            d["d2"][:G], d["ys2"][:G, 0], d["xs2"][:G, 0],
            d["bg"][:G], d["bg_y"][:G], d["bg_x"][:G], d["has_bg"][:G],
        )
        lat0 = model.apply(fs_vars, f0, method="encode",
                           mutable=False).astype(jnp.int32)[:, None]
        lat0_t = jnp.tile(lat0, (V, 1, 1, 1))
        speed_t = jnp.full((V * G,), 0.5, jnp.float32)
        gen = pipeline.core.apply(
            {"params": params}, lat0_t, texts, speed_t,
            method="generate_cached", rngs={"latent": jax.random.PRNGKey(7)},
        )
        video = pipeline.first_stage.decode(gen, variables=fs_vars)
        video = video.reshape(V, G, L - 1, *video.shape[2:])
        d_sign = jnp.mean((video[0] - video[1]) ** 2)
        d_axis = jnp.mean((video[0] - video[2]) ** 2)
        return video, d_sign, d_axis

    video, d_sign, d_axis = map(jax.device_get, run(params, texts))
    video = np.asarray(video)[..., 0]  # (V, G, L-1, 64, 64)

    print(f"\npairwise video MSE true-vs-sign_swap: {d_sign:.3e}, "
          f"true-vs-axis_swap: {d_axis:.3e}")
    print("(GT motion scale ~1.4e-3; an identical pair means captions "
          "don't steer generation)\n")

    for vi, (name, txt) in enumerate(variants.items()):
        score(name, txt, video[vi])


if __name__ == "__main__":
    main()
