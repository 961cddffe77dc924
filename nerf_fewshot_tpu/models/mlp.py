"""NeRF MLP model family.

Two canonical architectures cover every variant the reference uses or implies:

* :class:`NeRFMLP` — the "functional stack" superset: positional-encoded
  inputs (optionally with encoded view directions and/or per-point DINO
  features concatenated in), an n-layer ReLU trunk with optional skip
  connections and optional per-layer LoRA adapters, and rgb(sigmoid)/sigma
  heads off the final hidden state. This subsumes:
    - the baseline MLP (reference: src/models/nerf_model.py:5-24 — 8×256
      trunk, no skips, no view branch),
    - the DINO-conditioned, LoRA-capable ``NeRFMLP(pos_dim, dino_dim,
      hidden_dim, n_layers, lora_rank)`` that five reference scripts import
      but which is missing from the reference repo (reference call sites:
      src/training/train_lora.py:57, train_projection.py:51,
      train_baseline.py:42, train_dino_lora_pose.py:39),
    - the config-driven trainer's expected surface ``NeRFMLP(pos_freq,
      dir_freq, hidden_dim, num_density_layers, use_dino, dino_dim)``
      returning ``(rgb, sigma)`` (reference: src/training/train.py:82-89,229).

* :class:`NeRFWithDINO` — the "module stack": attention fusion of positional
  encoding with DINO features, a DensityMLP trunk with separate density and
  feature heads, and a view-dependent ColorMLP
  (reference: src/models/nerf_mlp.py:41-158).

Sigma is returned raw (pre-ReLU) in both cases; the volume renderer applies
ReLU inside the alpha computation (reference: nerf_mlp.py:193), and
``NeRFWithDINO``'s DensityMLP additionally ReLUs its density head to match
the reference (nerf_mlp.py:63) — double-ReLU is idempotent.

TPU notes: every hot matmul is (points × width) with width 256 — MXU-aligned
when points are batched in multiples of 8 (f32) / 16 (bf16). All activations
between trunk layers stay fusion-friendly elementwise ops; under the Pallas
render kernel the whole trunk runs out of VMEM per ray tile.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerf_fewshot_tpu.models.fusion import NeRFDINOFusion
from nerf_fewshot_tpu.models.lora import LoRADense, TorchDense, torch_linear_init
from nerf_fewshot_tpu.ops.encoding import positional_encoding


class NeRFMLP(nn.Module):
    """Unified functional-stack NeRF MLP.

    Input per point: ``[PE(pos)] (+ [PE(dir)] if use_viewdirs)
    (+ [dino] if dino_dim > 0)``, all concatenated; returns
    ``(rgb in [0,1], raw sigma)`` each of shape (..., 3) / (..., 1).

    Attributes:
        pos_freq: positional-encoding frequencies for positions (10 or 12).
        dir_freq: frequencies for view directions (used when use_viewdirs).
        use_viewdirs: concat encoded view dirs into the trunk input
            (reference: train_projection.py:126-128 pattern).
        dino_dim: per-point conditioning feature width (0 disables).
        hidden_dim / num_layers: trunk geometry (256 × 8 by default).
        skip_layers: trunk layer indices whose input re-concatenates the raw
            encoded input (classic NeRF skip; reference stores but never uses
            [4] — default empty for parity).
        lora_rank / lora_alpha: per-trunk-layer LoRA adapters (0 disables);
            matches the missing-class call sites (train_lora.py:57 rank 4,
            train_projection.py:51 rank 16).
    """

    pos_freq: int = 10
    dir_freq: int = 4
    use_viewdirs: bool = False
    dino_dim: int = 0
    hidden_dim: int = 256
    num_layers: int = 8
    skip_layers: Sequence[int] = ()
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.1
    # Optional constant init for the sigma head bias. The torch-default
    # U(±1/√fan_in) bias (None) is a coin flip: a negative draw combined with
    # ReLU-attenuated trunk activations can make sigma negative at *every*
    # point, and since alpha = 1-exp(-relu(σ)·d) has exactly zero gradient
    # there, training never escapes (the reference has the same hazard and
    # relies on RNG luck). A small positive constant (e.g. 0.1) guarantees a
    # live start without changing the architecture.
    sigma_bias_init: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        pts: jnp.ndarray,
        dirs: Optional[jnp.ndarray] = None,
        dino: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        parts = [positional_encoding(pts, self.pos_freq)]
        if self.use_viewdirs:
            if dirs is None:
                raise ValueError("use_viewdirs=True requires dirs")
            parts.append(positional_encoding(dirs, self.dir_freq))
        if self.dino_dim > 0:
            if dino is None:
                raise ValueError(f"dino_dim={self.dino_dim} requires dino features")
            parts.append(dino)
        x = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

        h = x
        for i in range(self.num_layers):
            if i in self.skip_layers and i > 0:
                h = jnp.concatenate([h, x], axis=-1)
            if self.lora_rank > 0:
                h = LoRADense(
                    self.hidden_dim,
                    rank=self.lora_rank,
                    alpha=self.lora_alpha,
                    dropout_rate=self.lora_dropout,
                    name=f"trunk_{i}",
                )(h, deterministic=deterministic)
            else:
                h = TorchDense(self.hidden_dim, name=f"trunk_{i}")(h)
            h = nn.relu(h)

        if self.sigma_bias_init is not None:
            sigma = nn.Dense(
                1,
                kernel_init=torch_linear_init(),
                bias_init=nn.initializers.constant(float(self.sigma_bias_init)),
                name="sigma_head",
            )(h)
        else:
            sigma = TorchDense(1, name="sigma_head")(h)
        rgb = nn.sigmoid(TorchDense(3, name="rgb_head")(h))
        return rgb, sigma


class DensityMLP(nn.Module):
    """Density trunk with ReLU'd density head and a feature head
    (reference: src/models/nerf_mlp.py:41-66)."""

    hidden_dim: int = 256
    num_layers: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = x
        for i in range(self.num_layers):
            h = nn.relu(TorchDense(self.hidden_dim, name=f"layer_{i}")(h))
        density = nn.relu(TorchDense(1, name="density_head")(h))
        features = TorchDense(self.hidden_dim, name="feature_head")(h)
        return density, features


class ColorMLP(nn.Module):
    """View-dependent color head (reference: src/models/nerf_mlp.py:68-84)."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, features: jnp.ndarray, dir_enc: jnp.ndarray) -> jnp.ndarray:
        h = jnp.concatenate([features, dir_enc], axis=-1)
        h = nn.relu(TorchDense(self.hidden_dim, name="layer_0")(h))
        h = nn.relu(TorchDense(self.hidden_dim // 2, name="layer_1")(h))
        return nn.sigmoid(TorchDense(3, name="rgb")(h))


class NeRFWithDINO(nn.Module):
    """Module-stack NeRF: DINO fusion → DensityMLP → view-dependent ColorMLP
    (reference: src/models/nerf_mlp.py:86-158).

    ``__call__(positions (N,3), directions (N,3), dino (N,dino_dim))``
    → ``(rgb (N,3), density (N,1))`` with density already ReLU'd (the renderer
    re-applies ReLU; idempotent).
    """

    pos_freq: int = 10
    dir_freq: int = 4
    dino_dim: int = 64
    hidden_dim: int = 256
    num_density_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        positions: jnp.ndarray,
        directions: jnp.ndarray,
        dino_features: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pos_enc = positional_encoding(positions, self.pos_freq)
        dir_enc = positional_encoding(directions, self.dir_freq)
        fused = NeRFDINOFusion(self.hidden_dim, name="dino_fusion")(
            pos_enc, dino_features
        )
        density, features = DensityMLP(
            self.hidden_dim, self.num_density_layers, name="density_mlp"
        )(fused)
        rgb = ColorMLP(self.hidden_dim // 2, name="color_mlp")(features, dir_enc)
        return rgb, density
