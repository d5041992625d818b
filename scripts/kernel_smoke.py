"""On-chip kernel smoke matrix: every Pallas kernel x every env knob.

VERDICT r3 weak #7: gn_conv and the cached-attention kernels were only
ever validated with ``interpret=True`` in CI — the Mosaic lowering itself
was never exercised, and MAGE_KL_FUSED=gnconv shipped crashing on the
real chip. This script makes "runs on the hardware" a checked property:
each knob value drives the FULL generate path (small batch / short clip
to bound compile time) in its own subprocess (env knobs are read at trace
time; process isolation keeps one crash from poisoning the matrix), plus
a direct VQ-kernel case with gradients. A case passes iff the subprocess
exits 0 and prints a finite checksum.

Run on the real chip (phase of the chip queue):
    python scripts/kernel_smoke.py            # full matrix
    python scripts/kernel_smoke.py --case gnconv   # one case, in-process

Writes runs/logs/kernel_smoke.json: {case: {"ok": bool, "sec": float}}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# case name -> (env overrides, runner name)
CASES: dict[str, tuple[dict[str, str], str]] = {
    # discrete MAGE cached sampler (vq kernel + axial kernels + KV cache)
    "mage_default": ({}, "mage"),
    "spatial_fusedblock": ({"MAGE_SPATIAL_ATTN": "fusedblock"}, "mage"),
    "spatial_xla": ({"MAGE_SPATIAL_ATTN": "xla"}, "mage"),
    "cached_pallas": ({"MAGE_CACHED_ATTN": "pallas"}, "mage"),
    "cached_pallas2": ({"MAGE_CACHED_ATTN": "pallas2"}, "mage"),
    "cached_xla": ({"MAGE_CACHED_ATTN": "xla"}, "mage"),
    "kv_int8": ({"MAGE_KV_QUANT": "int8"}, "mage"),
    "kv_int4": ({"MAGE_KV_QUANT": "int4"}, "mage"),
    # MAGE+ (KL-AE decoder kernels)
    "magep_default": ({}, "mage+"),
    "gnconv": ({"MAGE_KL_FUSED": "gnconv"}, "mage+"),
    "klup_naive": ({"MAGE_KL_UP": "naive"}, "mage+"),
    "klup_phased": ({"MAGE_KL_UP": "phased"}, "mage+"),
    # direct VQ Pallas kernel incl. straight-through gradient
    "vq_kernel": ({}, "vq"),
    # XLA:TPU nested-vmap gather+compose miscompile canary (round 4): the
    # flat form every eval uses must be bit-exact vs a numpy reference; the
    # nested form's divergence is reported (it corrupted every on-chip GT
    # composition until the r4 flat-form fix). CPU twin:
    # tests/test_device_data.py::test_nested_vmap_gather_compose_clean_on_cpu
    "nested_vmap_compose": ({}, "compose"),
}


def run_generate(model: str) -> float:
    """Tiny-shape end-to-end generate: flagship architecture, batch 2,
    8 frames. Returns the output checksum."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    frames_length = 8
    batch = 2
    pipeline = bench.build_pipeline(frames_length, model)
    rng = np.random.RandomState(0)
    ctx = pipeline.core.text_context_length
    host_batch = {
        "images": (rng.rand(batch, frames_length, 128, 128, 3)
                   .astype(np.float32) - 0.5),
        "text": np.zeros((batch, ctx), np.int32),
        "speed": rng.rand(batch).astype(np.float32),
    }
    host_batch["text"][:, 0] = 1
    host_batch["text"][:, 1:5] = rng.randint(3, 29, size=(batch, 4))
    host_batch["text"][:, 5] = 2
    params = pipeline.init(jax.random.PRNGKey(0), host_batch)
    fs_vars = pipeline.first_stage.variables

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            tree,
        )

    params, fs_vars = cast(params), cast(fs_vars)
    dev = {k: jnp.asarray(v) for k, v in host_batch.items()}
    dev["images"] = dev["images"].astype(jnp.bfloat16)
    dev["speed"] = dev["speed"].astype(jnp.bfloat16)

    gen = jax.jit(
        lambda p, fs, b, r: jnp.sum(
            pipeline.generate(p, b, r, fs_variables=fs, cached=True)
            .astype(jnp.float32)
        )
    )
    return float(gen(params, fs_vars, dev, jax.random.PRNGKey(1)))


def run_vq() -> float:
    """VQ Pallas kernel: ids + straight-through forward/backward on chip."""
    import jax
    import jax.numpy as jnp

    from mage_tpu.ops.vq import vq_straight_through

    k = jax.random.PRNGKey(0)
    z_e = jax.random.normal(k, (64, 16, 16, 256), jnp.float32)
    codebook = jax.random.normal(jax.random.PRNGKey(1), (512, 256))

    @jax.jit
    def fwd_bwd(z_e, codebook):
        def loss(z, cb):
            z_q, idx = vq_straight_through(z, cb)
            return jnp.sum(z_q**2) + jnp.sum(idx).astype(jnp.float32) * 0.0

        g = jax.grad(loss, argnums=(0, 1))(z_e, codebook)
        return sum(jnp.sum(jnp.abs(x)) for x in g)

    return float(fwd_bwd(z_e, codebook))


def run_compose() -> float:
    """On-chip GT-composition exactness: flat single-level form (used by
    every eval) vs a host numpy reference, plus the nested-vmap form's
    divergence as a canary. Fails iff the FLAT form is not bit-exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import mage_tpu.data.device_data as dd
    import mage_tpu.data.generators.cater_synthetic as cs

    compact = cs.build_compact_cater(2, 12, 0, dataset="CATER-GEN-v2",
                                     context_length=38)
    bank_np = np.concatenate(
        [compact["bank"][..., :3].astype(np.float32) / 127.5 - 1.0,
         compact["bank"][..., 3:].astype(np.float32)], axis=-1)
    bg_np = compact["background"].astype(np.float32) / 127.5 - 1.0
    val = compact["val"]
    G, L = 8, 10
    T = val["sid"].shape[1]
    pos = np.stack([np.clip(np.arange(L) * (T - 1) // (L - 1) + k % 3,
                            0, T - 1) for k in range(G)]).astype(np.int32)

    # numpy reference — mirrors compose_frames_cater (alpha-masked paste in
    # painter's order; dynamic_slice clamp semantics)
    sp, hw = bank_np.shape[1], bg_np.shape[0]
    ref = np.empty((G, L, hw, hw, 3), np.float32)
    for k in range(G):
        for j, t in enumerate(pos[k]):
            img = bg_np.copy()
            for s in range(val["sid"].shape[2]):
                spr = bank_np[val["sid"][k, t, s]]
                y = min(max(int(val["top"][k, t, s]), 0), hw - sp)
                x = min(max(int(val["left"][k, t, s]), 0), hw - sp)
                patch = img[y:y + sp, x:x + sp, :3]
                img[y:y + sp, x:x + sp, :3] = np.where(
                    spr[..., 3:4] > 0, spr[..., :3], patch)
            ref[k, j] = img

    bank = jnp.asarray(bank_np)
    background = jnp.asarray(bg_np)
    d = {k2: jnp.asarray(val[k2]) for k2 in ("sid", "top", "left")}
    pos_d = jnp.asarray(pos)
    ref_d = jnp.asarray(ref)

    def frames_at(idx, t):
        return dd.compose_frames_cater(bank, background,
                                       d["sid"][idx, t], d["top"][idx, t],
                                       d["left"][idx, t])

    @jax.jit
    def diffs():
        flat = frames_at(jnp.repeat(jnp.arange(G), L),
                         pos_d.reshape(-1)).reshape(G, L, hw, hw, 3)
        nested = jax.vmap(
            lambda i: frames_at(jnp.broadcast_to(i, (L,)), pos_d[i])
        )(jnp.arange(G))
        return (jnp.max(jnp.abs(flat - ref_d)),
                jnp.max(jnp.abs(nested - ref_d)))

    d_flat, d_nested = (float(x) for x in diffs())
    print(f"flat max|err|={d_flat} nested max|err|={d_nested} "
          f"({'KNOWN MISCOMPILE still present' if d_nested > 0 else 'nested clean — XLA may have fixed it'})")
    assert d_flat == 0.0, f"FLAT composition diverged on chip: {d_flat}"
    return d_nested


def run_case(name: str) -> float:
    env, runner = CASES[name]
    os.environ.update(env)
    if runner == "vq":
        return run_vq()
    if runner == "compose":
        return run_compose()
    return run_generate(runner)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default=None)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--out", default=os.path.join(REPO, "runs/logs/kernel_smoke.json"))
    args = ap.parse_args()

    if args.case:  # in-process single case (the subprocess entry)
        import math

        val = run_case(args.case)
        assert math.isfinite(val), val
        print(f"SMOKE_OK {args.case} checksum={val}")
        return 0

    results = {}
    for name in CASES:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", name],
            cwd=REPO, capture_output=True, text=True, timeout=args.timeout,
        )
        ok = proc.returncode == 0 and "SMOKE_OK" in proc.stdout
        results[name] = {"ok": ok, "sec": round(time.time() - t0, 1)}
        print(f"{'PASS' if ok else 'FAIL'} {name} ({results[name]['sec']}s)",
              flush=True)
        if not ok:
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-15:]
            print("\n".join("  | " + ln for ln in tail), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fp:
        json.dump(results, fp, indent=1)
    n_fail = sum(not r["ok"] for r in results.values())
    print(f"kernel smoke matrix: {len(results) - n_fail}/{len(results)} pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
