"""Metrics logging: CSV-backed with optional wandb, matching the metric names
tracked by the reference (`/root/reference/main.py:168-198`): loss, loss_data,
residual_mean_abs, loss_inequality, loss_optimization (+ ``_test`` variants),
residual_mean_abs_samples / residual_median_abs_samples, rel_CE_error,
rel_vf_error, fm_error."""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    """Append-only CSV logger with optional wandb mirroring."""

    def __init__(self, output_dir: str, wandb_project: Optional[str] = None, run_name: str = "run"):
        self.path = Path(output_dir) / "metrics.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fieldnames: list[str] = ["step", "time"]
        self._rows: list[dict] = []
        self._wandb = None
        if wandb_project is not None:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=run_name)
            except ImportError:
                self._wandb = None

    def log(self, metrics: dict, step: int):
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        self._rows.append(row)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def flush(self):
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)

    def close(self):
        self.flush()
        if self._wandb is not None:
            self._wandb.finish()
