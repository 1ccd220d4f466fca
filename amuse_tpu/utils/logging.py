"""Run logging: JSONL metrics + optional wandb, debug-gated.

Replaces the reference's wandb-only logging (trainer.py:193-201,340-350;
creds hardcoded in configs/logger.json) with a local-first JSONL stream that
survives offline runs; wandb attaches opportunistically if importable and
configured via WANDB_API_KEY.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class RunLogger:
    def __init__(self, run_dir: Optional[Path], use_wandb: bool = True):
        self.path = Path(run_dir) / "metrics.jsonl" if run_dir else None
        self._wandb = None
        if run_dir and use_wandb:
            try:
                import os

                if os.environ.get("WANDB_API_KEY"):
                    import wandb

                    self._wandb = wandb
                    wandb.init(project="amuse-tpu", dir=str(run_dir))
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: dict) -> None:
        record = {"step": int(step), "time": time.time(), **metrics}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._wandb:
            self._wandb.log(metrics, step=step)
