"""Structured metric streams (JSONL) — the observability layer.

Replaces the reference's console-print logging + MLflow tracking
(SURVEY.md §5.5, reference: main.py:40-96, ppi_main.py:299-311) with a
dependency-free run tracker: per-run params, per-step metric streams as
JSONL, and artifact registration, all under a run directory.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

from protgram_directgcn_tpu.utils.io import ensure_dir, logger


class MetricLogger:
    """One run = one directory: params.json, metrics.jsonl, artifacts.json."""

    def __init__(self, run_dir: os.PathLike, run_name: str = "run"):
        self.run_dir = ensure_dir(run_dir)
        self.run_name = run_name
        self._metrics_file = open(os.path.join(str(self.run_dir), "metrics.jsonl"), "a")
        self._artifacts: Dict[str, str] = {}
        self._t0 = time.time()

    def log_params(self, params: Dict[str, Any]) -> None:
        with open(os.path.join(str(self.run_dir), "params.json"), "w") as f:
            json.dump(params, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        record = {"t": round(time.time() - self._t0, 3), "run": self.run_name}
        if step is not None:
            record["step"] = step
        record.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()})
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()

    def log_artifact(self, name: str, path: os.PathLike) -> None:
        self._artifacts[name] = str(path)
        with open(os.path.join(str(self.run_dir), "artifacts.json"), "w") as f:
            json.dump(self._artifacts, f, indent=2)

    def close(self) -> None:
        self._metrics_file.close()

    def __enter__(self) -> "MetricLogger":
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(run_dir: os.PathLike):
    """Load a run's metric stream back as a list of dicts."""
    path = os.path.join(str(run_dir), "metrics.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
