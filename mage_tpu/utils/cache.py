"""Persistent XLA compilation cache — first run on a machine pays the
(possibly remote/tunneled) compile, later runs reuse it."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "MAGE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/jax_comp")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
