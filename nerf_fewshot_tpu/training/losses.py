"""Loss functions.

Canonical multi-part NeRF loss (reference: src/models/nerf_mlp.py:217-258):
rgb MSE + optional depth L1 + optional weight-sparsity regularizer, combined
with config weights. The config-driven trainer's NeRFLoss reduces to the rgb
term only (reference: train.py:27-44) — that falls out of the weights.

All losses support an optional per-ray validity ``mask`` so the engine can
pad partial ray batches to a static shape without biasing gradients: masked
means are exact means over the real rays.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from nerf_fewshot_tpu.training.config import LossConfig


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    # broadcast mask over trailing dims
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    denom = jnp.maximum(jnp.sum(mask), 1.0) * (x.size / mask.size)
    return jnp.sum(x * mask) / denom


def nerf_loss(
    pred_rgb: jnp.ndarray,
    target_rgb: jnp.ndarray,
    cfg: LossConfig,
    pred_depth: Optional[jnp.ndarray] = None,
    target_depth: Optional[jnp.ndarray] = None,
    weights: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Compute the loss dict {'rgb', ['depth'], ['regularization'], 'total'}."""
    losses: Dict[str, jnp.ndarray] = {}
    losses["rgb"] = _masked_mean((pred_rgb - target_rgb) ** 2, mask)
    total = cfg.rgb_weight * losses["rgb"]

    if target_depth is not None and pred_depth is not None and cfg.depth_weight > 0:
        losses["depth"] = _masked_mean(jnp.abs(pred_depth - target_depth), mask)
        total = total + cfg.depth_weight * losses["depth"]

    if weights is not None and cfg.reg_weight > 0:
        losses["regularization"] = _masked_mean(weights**2, mask)
        total = total + cfg.reg_weight * losses["regularization"]

    losses["total"] = total
    return losses
