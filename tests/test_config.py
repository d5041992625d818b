import io

from mage_tpu.config import (
    Config,
    instantiate_from_config,
    load_config,
    loads_config,
    merge_configs,
    save_config,
)


class _Dummy:
    def __init__(self, a, b=2, split=None):
        self.a, self.b, self.split = a, b, split


def test_attr_access_and_nesting():
    cfg = Config({"model": {"params": {"lr": 1e-4, "steps": [1, 2]}}})
    assert cfg.model.params.lr == 1e-4
    assert cfg.get_path("model.params.lr") == 1e-4
    assert cfg.get_path("model.missing", "x") == "x"
    cfg.set_path("model.params.lr", 5.0)
    assert cfg.model.params.lr == 5.0


def test_merge_is_ordered_and_deep():
    base = {"a": 1, "nest": {"x": 1, "y": 2}}
    out = merge_configs(base, {"a": 3, "nest": {"y": 9, "z": 7}})
    assert out.a == 3 and out.nest.x == 1 and out.nest.y == 9 and out.nest.z == 7
    # base untouched
    assert base["nest"]["y"] == 2


def test_instantiate_with_merge_override():
    cfg = {"target": "tests.test_config._Dummy", "params": {"a": 1, "b": 5}}
    obj = instantiate_from_config(cfg, {"split": "train", "b": 9})
    assert (obj.a, obj.b, obj.split) == (1, 9, "train")


def test_yaml_roundtrip(tmp_path):
    cfg = loads_config("train:\n  lr: 5e-5\n  cos: true\n")
    assert cfg.train.cos is True
    p = tmp_path / "c.yaml"
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.train.lr == cfg.train.lr


def test_load_from_stream():
    cfg = load_config(io.StringIO("a: 1"))
    assert cfg.a == 1
