"""Run logging: JSONL metrics stream + optional TensorBoard.

Replaces the reference's TensorBoardLogger-only observability (reference
train_spec_roll.py:36-52, task/diffusion.py:267). Every scalar goes to
`<run_dir>/metrics.jsonl` (machine-readable, no deps); TensorBoard event
files are written too when `torch.utils.tensorboard` is importable.
Figures (validation roll grids) go through `log_figure`.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, run_dir: str | pathlib.Path, tensorboard: bool = True):
        self.run_dir = pathlib.Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.run_dir / "metrics.jsonl", "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.run_dir / "tb"))
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, Any]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def log_config(self, config: Dict[str, Any]):
        path = self.run_dir / "config.json"
        path.write_text(json.dumps({k: str(v) for k, v in config.items()},
                                   indent=2))

    def log_figure(self, step: int, tag: str, fig):
        """Save a matplotlib figure to disk (and TB if available) —
        the reference's add_figure validation grids
        (reference task/diffusion.py:643-649)."""
        figs = self.run_dir / "figures"
        figs.mkdir(exist_ok=True)
        fig.savefig(figs / f"{tag.replace('/', '_')}_{step:08d}.png", dpi=100)
        if self._tb is not None:
            self._tb.add_figure(tag, fig, int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
