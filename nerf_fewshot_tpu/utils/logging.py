"""Structured training observability.

The reference's observability is prints + a wandb run + a hand-rolled CSV
loss log (reference: train_dino_lora_pose.py:65,129-131; SURVEY.md §5.5).
Here: a JSONL sink (one dict per line, machine-parseable) — or a CSV sink
when the log path ends in ``.csv`` (header from the first record, one row
per record, matching the reference variant's format) — an optional wandb
mirror when the package + credentials exist, and PNG image dumps via PIL.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class JSONLLogger:
    def __init__(self, path: Optional[str] = None, use_wandb: bool = False,
                 wandb_project: str = "nerf-fewshot-tpu", run_name: str = "run",
                 config: Optional[Dict] = None):
        self.path = path
        self._fh = None
        self._csv = None
        self._csv_fields: Optional[list] = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
            self._fh = open(path, "a", newline="" if path.endswith(".csv") else None)
            if path.endswith(".csv"):
                self._csv = csv.writer(self._fh)
        self._wandb = None
        if use_wandb:  # pragma: no cover - needs credentials
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=run_name, config=config or {}
                )
            except Exception:
                self._wandb = None

    def log(self, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("time", time.time())
        if self._csv is not None:
            if self._csv_fields is None:
                self._csv_fields = sorted(record)
                self._csv.writerow(self._csv_fields)
            self._csv.writerow(
                [float(record[k]) if isinstance(record.get(k), (int, float))
                 else record.get(k, "") for k in self._csv_fields]
            )
            self._fh.flush()
        elif self._fh:
            self._fh.write(json.dumps(record, default=float) + "\n")
            self._fh.flush()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log({k: v for k, v in record.items() if k != "time"})

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()


def save_png(path: str, image: np.ndarray) -> None:
    """Save an (H, W, 3) float [0,1] image as PNG."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arr = np.clip(np.asarray(image) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
