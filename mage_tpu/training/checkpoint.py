"""Orbax-backed checkpointing of ``{step, params, (batch_stats,) opt_state}``.

Capability parity with the reference's torch.save checkpoints
(train_vqvae.py:174-182 saves ``best.pt``+``model_{epoch}.pt``;
main_mage.py:189-199 saves ``iteration_N.pth``+``model_best.pth``), plus a
real resume path — the reference has none for stage 2 (main_mage.py:122,
SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any) -> str:
        """Atomic-swap save: write to a temp dir, then rename into place.
        In-place force-overwrites let concurrent readers (e.g. a sampling
        job reading model_best during training) observe truncated files."""
        import shutil

        final = self.path(name)
        tmp = final + ".tmp"
        backup = final + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        self._ckptr.save(tmp, tree, force=True)
        self._ckptr.wait_until_finished()
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.isdir(final):
            os.rename(final, backup)
        os.rename(tmp, final)
        shutil.rmtree(backup, ignore_errors=True)
        return final

    def restore(self, name_or_path: str, template: Optional[Any] = None) -> Any:
        p = (
            name_or_path
            if os.path.isabs(name_or_path)
            else self.path(name_or_path)
        )
        if template is not None:
            template = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            return self._ckptr.restore(p, template)
        return self._ckptr.restore(p)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def latest(self, prefix: str) -> Optional[str]:
        """Newest checkpoint directory name starting with ``prefix``."""
        if not os.path.isdir(self.directory):
            return None
        cands = [
            d
            for d in os.listdir(self.directory)
            if d.startswith(prefix) and os.path.isdir(self.path(d))
        ]
        if not cands:
            return None

        def step_of(name: str) -> int:
            tail = name[len(prefix):]
            digits = "".join(ch for ch in tail if ch.isdigit())
            return int(digits) if digits else -1

        return max(cands, key=step_of)
