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
        """Non-blocking: device scalars are NOT fetched here. ``float()``-ing
        a jax scalar is a blocking host round-trip — on a tunneled/remote
        chip that RPC costs tens of ms, and the drivers log every dispatch
        (log_freq == chunk_steps), which measurably slowed the train loop.
        Instead the device→host copy is *started* asynchronously and the
        value is materialized at flush(), by which time it has landed."""
        row = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            copy_async = getattr(v, "copy_to_host_async", None)
            if copy_async is not None:
                copy_async()
            row[k] = v
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        self._rows.append(row)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def flush(self):
        for row in self._rows:
            for k, v in row.items():
                if not isinstance(v, (int, float, str)):
                    row[k] = float(v)
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)

    def close(self):
        self.flush()
        if self._wandb is not None:
            self._wandb.finish()
