"""Attention-weighted fusion of NeRF positional encodings with DINO features.

Canonical implementation of the reference's duplicated ``NeRFDINOFusion``
(reference: src/models/dino_feature_model.py:150-196 and
src/models/lora_dino.py:146-193): concat → 2-layer fusion MLP → 2-way softmax
attention over (pos vs dino) → re-weight the *original* inputs → run the same
fusion MLP again (shared weights, as in the reference) → output projection.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from nerf_fewshot_tpu.models.lora import TorchDense


class NeRFDINOFusion(nn.Module):
    """Fuse (N, pos_dim) positional encodings with (N, dino_dim) features.

    Returns (N, hidden_dim) fused features.
    """

    hidden_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, pos_encoding: jnp.ndarray, dino_features: jnp.ndarray):
        fusion1 = TorchDense(self.hidden_dim, name="fusion_0")
        fusion2 = TorchDense(self.hidden_dim, name="fusion_1")

        def fusion(x):
            # Shared-weight fusion MLP: applied to both the raw concat and the
            # attention-re-weighted concat (reference re-calls self.fusion).
            return nn.relu(fusion2(nn.relu(fusion1(x))))

        combined = jnp.concatenate([pos_encoding, dino_features], axis=-1)
        fused = fusion(combined)

        att = nn.relu(TorchDense(self.hidden_dim // 4, name="attention_0")(fused))
        weights = nn.softmax(TorchDense(2, name="attention_1")(att), axis=-1)

        pos_weighted = pos_encoding * weights[..., 0:1]
        dino_weighted = dino_features * weights[..., 1:2]
        final = fusion(jnp.concatenate([pos_weighted, dino_weighted], axis=-1))
        return TorchDense(self.hidden_dim, name="output_proj")(final)
