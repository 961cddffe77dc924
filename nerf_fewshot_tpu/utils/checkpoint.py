"""Atomic checkpoint save/restore.

The reference only ever *saves* checkpoints (torch.save dicts, two mutually
incompatible key schemas — reference: train.py:374-389 vs
train_multiscale.py:366-378) and has no resume path (SURVEY.md §5.4). Here a
checkpoint is a single msgpack-serialized pytree {params, opt_state, ...}
written via temp-file + atomic rename (preemption-safe), plus a JSON sidecar
with scalar metadata, and restore is first-class.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

from flax import serialization


def save_checkpoint(path: str, tree: Any, metadata: Optional[Dict] = None) -> None:
    """Serialize ``tree`` to ``path`` atomically; metadata → ``path.json``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    data = serialization.to_bytes(tree)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if metadata is not None:
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(metadata, f, indent=2, default=str)
            os.replace(tmp, path + ".json")
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Optional[Dict]]:
    """Restore a pytree saved by :func:`save_checkpoint` into the structure
    of ``target``; returns (tree, metadata or None)."""
    with open(path, "rb") as f:
        tree = serialization.from_bytes(target, f.read())
    meta = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return tree, meta
