"""Structured training observability.

The reference's observability is prints + a wandb run + a hand-rolled CSV
(SURVEY.md §5.5). Here: a JSONL sink (one dict per line, machine-parseable),
an optional wandb mirror when the package + credentials exist, and PNG image
dumps via PIL.
"""

from __future__ import annotations

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
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
            self._fh = open(path, "a")
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
        if self._fh:
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
