"""LoRA adapters and torch-compatible initializers.

The reference carries four near-identical ``LoRALinear`` copies
(reference: src/models/dino_feature_model.py:7-32, lora_dino.py:7-32,
multi_scale_dino.py:185-210 with dropout; src/models/dino_lora.py:6-31
without). This is the one canonical implementation: a frozen base projection
plus a rank-``r`` update ``(alpha/r) * B @ dropout(A @ x)`` with
``A ~ kaiming_uniform(a=sqrt(5))`` and ``B = 0``.

Freezing is expressed functionally: LoRA parameter leaves carry ``lora_a`` /
``lora_b`` in their path, and :func:`lora_label_fn` maps a parameter pytree to
{'lora','base'} labels for ``optax.multi_transform`` — the TPU-native
equivalent of the reference's ``requires_grad`` toggles
(reference: src/training/train.py:107-113, train_lora.py:29-36).

TPU notes: a LoRA matmul pair is two skinny MXU matmuls (in×r, r×out); XLA
fuses the scaled add into the base matmul's epilogue.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_linear_init(scale: float = 1.0) -> Callable:
    """U(-scale/sqrt(fan_in), +scale/sqrt(fan_in)) — torch ``nn.Linear``'s
    default weight/bias distribution (kaiming_uniform(a=sqrt(5)) on a 2-D
    weight reduces to exactly this bound).

    Weight-parity with torch checkpoints also needs the *bias* drawn with the
    weight's fan_in; flax passes the bias shape (out,), so the Dense modules
    below use ``_torch_bias_init`` with an explicit fan_in instead.
    """

    def init(key, shape, dtype=jnp.float32):
        # flax Dense kernels are (in, out): fan_in is shape[0].
        fan_in = shape[0]
        bound = scale / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_bias_init(fan_in: int) -> Callable:
    """torch ``nn.Linear`` bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def kaiming_uniform_init(a: float) -> Callable:
    """torch ``nn.init.kaiming_uniform_(a=a)`` for (in, out) flax kernels:
    bound = sqrt(6 / ((1 + a^2) * fan_in)).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = math.sqrt(6.0 / ((1.0 + a * a) * fan_in))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchDense(nn.Dense):
    """``nn.Dense`` with torch ``nn.Linear``'s default init distribution."""

    def setup(self):
        pass

    @nn.compact
    def __call__(self, inputs):
        fan_in = inputs.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_init(), (fan_in, self.features), self.param_dtype
        )
        y = inputs @ kernel.astype(self.dtype or inputs.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", torch_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y


class LoRADense(nn.Module):
    """Dense layer with a rank-``r`` LoRA update.

    out = base(x) + (alpha/rank) * dropout(x @ A) @ B
    (reference math: src/models/dino_feature_model.py:29-32).

    Attributes:
        features: output width.
        rank: LoRA rank r (0 disables LoRA entirely → plain TorchDense).
        alpha: LoRA scaling numerator.
        dropout_rate: dropout on the A-projection input path (the reference
            applies dropout to ``A(x)``; we match that placement).
        use_bias: bias on the base projection.
    """

    features: int
    rank: int = 0
    alpha: float = 16.0
    dropout_rate: float = 0.1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        base = TorchDense(self.features, use_bias=self.use_bias, name="base")(x)
        if self.rank <= 0:
            return base
        fan_in = x.shape[-1]
        lora_a = self.param(
            "lora_a", kaiming_uniform_init(math.sqrt(5.0)), (fan_in, self.rank)
        )
        lora_b = self.param(
            "lora_b", nn.initializers.zeros_init(), (self.rank, self.features)
        )
        h = x @ lora_a
        if self.dropout_rate > 0.0:
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return base + (self.alpha / self.rank) * (h @ lora_b)


def lora_label_fn(params) -> Any:
    """Label each param leaf 'lora' or 'base' by its path.

    Mirrors the reference's ``'lora' in name`` trainability filter
    (reference: src/training/train.py:107-113). Use with
    ``optax.multi_transform`` to train LoRA-only phases
    (reference: src/training/train_lora.py:89-93).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_one(path):
        return "lora" if any("lora" in str(p) for p in path) else "base"

    labels = [label_one(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)
