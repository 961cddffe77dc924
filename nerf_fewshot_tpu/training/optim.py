"""Optimizers and LR schedules with torch-matching semantics.

* ``kind='adam'`` reproduces torch ``optim.Adam(weight_decay=wd)``
  (reference: train.py:114-118): L2 decay is added to the gradient *before*
  the Adam moment updates — i.e. ``optax.add_decayed_weights`` in front of
  ``scale_by_adam``, which is NOT what ``optax.adamw`` does (decoupled).
* ``kind='adamw'`` reproduces torch ``optim.AdamW``
  (reference: train_multiscale.py:61-65) — decoupled decay after scaling.
* MultiStepLR (reference: train.py:120-124) is an epoch-indexed piecewise
  constant schedule; the engine feeds the epoch's LR through
  ``optax.inject_hyperparams`` so no re-jit happens at milestones.
* ``lora_only`` masks non-LoRA params to zero-update — the functional
  equivalent of the reference's phase-2 freeze + fresh optimizer
  (reference: train_lora.py:89-93).
"""

from __future__ import annotations

from typing import Sequence

import optax

from nerf_fewshot_tpu.models.lora import lora_label_fn
from nerf_fewshot_tpu.training.config import OptimizerConfig


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float):
    """Return epoch -> lr (torch MultiStepLR semantics: decays at each
    milestone epoch)."""

    def lr_at(epoch: int) -> float:
        lr = base_lr
        for m in milestones:
            if epoch >= m:
                lr *= gamma
        return lr

    return lr_at


def make_optimizer(
    cfg: OptimizerConfig,
    params,
    lora_only: bool = False,
) -> optax.GradientTransformation:
    """Build the optax chain; LR is injected as a hyperparameter named
    ``learning_rate`` (update per epoch via ``set_learning_rate``)."""

    @optax.inject_hyperparams
    def base(learning_rate):
        chain = []
        if cfg.grad_clip > 0:
            chain.append(optax.clip_by_global_norm(cfg.grad_clip))
        if cfg.kind == "adam":
            if cfg.weight_decay > 0:
                chain.append(optax.add_decayed_weights(cfg.weight_decay))
            chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            chain.append(optax.scale(-1.0 * learning_rate))
        elif cfg.kind == "adamw":
            chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
            if cfg.weight_decay > 0:
                chain.append(optax.add_decayed_weights(cfg.weight_decay))
            chain.append(optax.scale(-1.0 * learning_rate))
        else:
            raise ValueError(f"unknown optimizer kind: {cfg.kind}")
        return optax.chain(*chain)

    tx = base(learning_rate=cfg.lr)
    if lora_only:
        labels = lora_label_fn(params)
        tx = optax.multi_transform(
            {"lora": tx, "base": optax.set_to_zero()}, labels
        )
    return tx


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning_rate hyperparameter in-place-ish."""

    def visit(state):
        if hasattr(state, "hyperparams") and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = lr
            return True
        if isinstance(state, tuple):
            return any(visit(s) for s in state)
        if hasattr(state, "inner_states"):  # multi_transform
            return any(visit(s.inner_state) for s in state.inner_states.values())
        return False

    visit(opt_state)
    return opt_state
