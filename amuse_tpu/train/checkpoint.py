"""Checkpointing: orbax with explicit metadata.

Replaces the reference's metrics-encoded-in-filename scheme
(trainer.py:328,468-496; selection by filename regex in
infer_ldm.py:79-105, infer_pretrained_vae.py:23-42,
infer_pretrained_ast_evp.py:22-32) with orbax checkpoints carrying a
metadata dict; "best" selection reads metadata, not filenames. Mid-epoch
resume (step-granular) comes for free - the reference had none (SURVEY §5).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoints of arbitrary pytrees + JSON metadata."""

    def __init__(self, directory):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, step: int) -> Path:
        return self.directory / f"step_{step:08d}"

    def save(self, step: int, tree: Any, metrics: Optional[dict] = None) -> Path:
        path = self._path(step)
        self._ckpt.save(path / "state", jax.tree.map(np.asarray, tree))
        # orbax saves asynchronously; the step directory must exist before
        # the metadata sidecar is written next to it.
        self._ckpt.wait_until_finished()
        meta = {"step": int(step), "metrics": _jsonable(metrics or {})}
        path.mkdir(parents=True, exist_ok=True)
        (path / "metadata.json").write_text(json.dumps(meta, indent=1))
        return path

    def steps(self) -> list[int]:
        return sorted(
            int(p.name.split("_")[1]) for p in self.directory.glob("step_*") if p.is_dir()
        )

    def metadata(self, step: int) -> dict:
        return json.loads((self._path(step) / "metadata.json").read_text())

    def restore(self, step: Optional[int] = None, template: Any = None) -> tuple[Any, dict]:
        """Restore a step (default: latest) -> (tree, metadata)."""
        steps = self.steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        step = steps[-1] if step is None else step
        tree = self._ckpt.restore(
            self._path(step) / "state",
            target=None if template is None else jax.tree.map(np.asarray, template),
        )
        return tree, self.metadata(step)

    def best_step(self, metric: str = "total", mode: str = "min") -> int:
        """Select by recorded metric - the principled replacement for the
        reference's filename parsing ("best" = min total loss / max accuracy)."""
        steps = self.steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        scored = []
        for s in steps:
            m = self.metadata(s)["metrics"]
            if metric in m:
                scored.append((m[metric], s))
        if not scored:
            return steps[-1]
        pick = min(scored) if mode == "min" else max(scored)
        return pick[1]


def restore_train_state(directory, state, label: str) -> tuple[Any, int]:
    """Restore a full TrainState (params + optimizer moments + step), the
    analog of the reference's wOpt checkpoints (trainer.py:468-496).

    Falls back to params-only restore for checkpoints written before the
    full-state format (with a loud warning - optimizer moments restart).
    Returns (state, start_epoch).
    """
    mgr = CheckpointManager(directory)
    try:
        restored, meta = mgr.restore(template=state)
        what = "full train state (params + optimizer)"
        state = type(state)(*restored) if isinstance(restored, (tuple, list)) else restored
    except Exception:
        restored, meta = mgr.restore(template=state.params)
        state = state._replace(params=restored)
        what = "params ONLY (old checkpoint format; optimizer moments reset)"
    start_epoch = int(meta.get("step", 0))
    print(f"[{label}] resumed {what} from {directory} at epoch {start_epoch}")
    return state, start_epoch


def _jsonable(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        try:
            out[k] = float(v)
        except (TypeError, ValueError):
            out[k] = str(v)
    return out
