"""Configuration system: YAML configs with ``{target, params}`` instantiation.

Mirrors the reference's OmegaConf-based schema (reference:
utils/util.py:45-63, config/*.yaml) without depending on OmegaConf:

- ``Config`` is a dict subclass with attribute access and deep-merge.
- ``instantiate_from_config(cfg, merge=...)`` builds ``target(**params)``.

The reference's runtime-merge branch builds ``OmegaConf.merge(*{...})`` over
a *set* literal (utils/util.py:53), making merge order nondeterministic.
Here merge is ordered and documented: ``merge`` overrides ``params``.
"""

from __future__ import annotations

import copy
import importlib
import io
import os
from typing import Any, Mapping, Optional

import yaml


class Config(dict):
    """A dict with attribute access, recursive wrapping, and deep merge."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            super().__setitem__(k, _wrap(v))

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __setitem__(self, name: str, value: Any) -> None:
        super().__setitem__(name, _wrap(value))

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get_path(self, dotted: str, default: Any = None) -> Any:
        """``cfg.get_path("model.params.lr")`` — dotted lookup."""
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Config):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value

    def to_dict(self) -> dict:
        return _unwrap(self)


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return [_wrap(v) for v in value]
    return value


def _unwrap(value: Any) -> Any:
    if isinstance(value, Mapping):
        return {k: _unwrap(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_unwrap(v) for v in value]
    return value


def merge_configs(base: Optional[Mapping], override: Optional[Mapping]) -> Config:
    """Deep merge with deterministic precedence: ``override`` wins.

    (Fixes the unordered set-merge at reference utils/util.py:53.)
    """
    out = Config(copy.deepcopy(_unwrap(base)) if base else {})
    for k, v in (override or {}).items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = merge_configs(out[k], v)
        else:
            out[k] = copy.deepcopy(_unwrap(v)) if isinstance(v, Mapping) else v
    return out


def load_config(path: str | os.PathLike | io.IOBase) -> Config:
    if hasattr(path, "read"):
        return Config(yaml.safe_load(path) or {})
    with open(path, "r") as fp:
        return Config(yaml.safe_load(fp) or {})


def loads_config(text: str) -> Config:
    return Config(yaml.safe_load(text) or {})


def save_config(cfg: Mapping, path: str | os.PathLike) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fp:
        yaml.safe_dump(_unwrap(cfg), fp, sort_keys=False)


# Reference-repo class paths -> mage_tpu equivalents, so the reference's
# YAML configs work unmodified (reference config/*.yaml name torch classes,
# e.g. config/mage_caterv1.yaml:10,24,37,44).
REFERENCE_TARGET_ALIASES = {
    "modules.vqvae_model.VectorQuantizedVAE": "mage_tpu.models.vqvae.VectorQuantizedVAE",
    "modules.mage_model.MAGE": "mage_tpu.models.pipeline.MagePipeline",
    "modules.mage_model.TransformerTextEncoder": "mage_tpu.models.layers.TransformerTextEncoder",
    "modules.mage_model.BertTextualHead": "mage_tpu.models.text_heads.BertTextualHead",
    "modules.mage_model.MAEncoder": "mage_tpu.models.layers.MAEncoder",
    "modules.mage_model.FlatAxialDecoder": "mage_tpu.models.mage.FlatAxialDecoder",
    "ldm.models.autoencoder.AutoencoderKL": "mage_tpu.models.autoencoder_kl.AutoencoderKL",
}


def get_obj_from_str(string: str):
    """Resolve ``"module.sub.Class"`` to the class/function object.

    Reference-repo class paths are transparently aliased to their mage_tpu
    equivalents (REFERENCE_TARGET_ALIASES). (Reference: utils/util.py:57-63.)
    """
    string = REFERENCE_TARGET_ALIASES.get(string, string)
    module, cls = string.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def resolve_target(config: Optional[Mapping], default=None):
    """Class named by ``config['target']`` (alias-resolved), or ``default``
    when the config carries no target (reference mage_model.py:474-477
    instantiates every sub-component from its ``target``)."""
    if isinstance(config, Mapping) and config.get("target"):
        return get_obj_from_str(str(config["target"]))
    return default


def instantiate_from_config(config: Mapping, merge: Optional[Mapping] = None):
    """Build ``target(**params)`` from a ``{target, params}`` config node.

    ``merge`` (runtime injection, e.g. ``{'split': 'train'}``) overrides
    config params deterministically. (Reference: utils/util.py:45-55;
    call sites main_mage.py:79-81, mage_model.py:474-477.)
    """
    if not isinstance(config, Mapping) or "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    params = merge_configs(config.get("params", {}), merge or {})
    return get_obj_from_str(config["target"])(**params)
