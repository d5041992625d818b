"""Guards for the driver-bench robustness machinery (VERDICT r4 #1).

BENCH_r04 was rc=124/parsed-null because a cold XLA compile cache pushed
bench.py past the driver timeout. The fixes under test:

  - bench._is_headline_tpu: only the exact headline configuration on a
    real TPU may be persisted to / served from BENCH_LASTGOOD.json — a
    CPU smoke test or an L=64 study config must never masquerade as the
    round number (a 2.5 f/s CPU record briefly poisoned the file).
  - cache._seed_from_repo: the headline program's compiled executables are
    committed under tools/jax_cache_seed/ and restored byte-identically
    into the (VM-reset-wiped) cache dir.
"""

import gzip
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from mage_tpu.utils.cache import _seed_from_repo


HEADLINE = {
    "config": {"model": "mage", "frames_length": 16, "batch": 32,
               "knobs": {}, "platform": "tpu"},
}


def _variant(**overrides):
    cfg = dict(HEADLINE["config"])
    cfg.update(overrides)
    return {"config": cfg}


def test_headline_tpu_accepted():
    assert bench._is_headline_tpu(HEADLINE)


def test_cpu_platform_rejected():
    assert not bench._is_headline_tpu(_variant(platform="cpu"))


def test_missing_platform_rejected():
    cfg = dict(HEADLINE["config"])
    del cfg["platform"]
    assert not bench._is_headline_tpu({"config": cfg})


def test_study_configs_rejected():
    assert not bench._is_headline_tpu(_variant(frames_length=64, batch=8))
    assert not bench._is_headline_tpu(_variant(model="mage+"))
    assert not bench._is_headline_tpu(
        _variant(knobs={"MAGE_KV_QUANT": "int8"}))


def test_empty_record_rejected():
    assert not bench._is_headline_tpu({})


def test_write_last_good_refuses_non_headline(tmp_path, monkeypatch):
    # _write_last_good writes next to bench.py; a non-headline result must
    # be a no-op regardless of where that is
    import json

    target = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                          "BENCH_LASTGOOD.json")
    before = None
    if os.path.exists(target):
        with open(target) as f:
            before = f.read()
    bench._write_last_good(
        {"value": 2.5, "config": {"platform": "cpu", "model": "mage",
                                  "frames_length": 4, "batch": 1,
                                  "knobs": {}}})
    after = None
    if os.path.exists(target):
        with open(target) as f:
            after = f.read()
    assert before == after, "non-headline result must not touch last-good"
    if before is not None:
        rec = json.loads(before)
        assert bench._is_headline_tpu(rec), (
            "checked-in BENCH_LASTGOOD.json must itself satisfy the guard")


def test_cache_seed_restores_byte_identical(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seed_dir = os.path.join(repo, "tools", "jax_cache_seed")
    if not os.path.isdir(seed_dir) or not os.listdir(seed_dir):
        import pytest

        pytest.skip("no committed cache seed")
    cache_dir = str(tmp_path / "jax_comp")
    _seed_from_repo(cache_dir)
    names = sorted(os.listdir(cache_dir))
    assert names, "seeding produced no cache entries"
    for name in names:
        with gzip.open(os.path.join(seed_dir, name + ".gz"), "rb") as f:
            want = hashlib.sha256(f.read()).hexdigest()
        with open(os.path.join(cache_dir, name), "rb") as f:
            got = hashlib.sha256(f.read()).hexdigest()
        assert got == want
    # idempotent: re-seeding over existing entries is a no-op
    mtimes = {n: os.path.getmtime(os.path.join(cache_dir, n)) for n in names}
    _seed_from_repo(cache_dir)
    for n in names:
        assert os.path.getmtime(os.path.join(cache_dir, n)) == mtimes[n]
