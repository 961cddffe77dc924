"""Small host-side utilities: checkpointing, logging, image IO."""

from nerf_fewshot_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
from nerf_fewshot_tpu.utils.logging import JSONLLogger

__all__ = ["save_checkpoint", "restore_checkpoint", "JSONLLogger"]
