"""Spatial and multi-scale DINO feature extractors.

Canonical flax implementations of the reference's duplicated extractors:

* :class:`SpatialDINOFeatures` (reference: src/models/dino_feature_model.py:
  34-148, older dup lora_dino.py:34-144): frozen DINOv2 backbone (LoRA
  optionally injected into q/k/v), CLS dropped, patch grid + learnable
  spatial position embedding, 3-layer projection to ``output_dim`` 64.
* :class:`MultiScaleDINOFeatures` (reference: src/models/multi_scale_dino.py:
  7-183): backbone run at input scales [1, 2, 4]; per-scale 768→256→128
  projection; one shared 8-head self-attention applied within each scale's
  token grid; coarser scales bilinearly upsampled to the finest grid;
  concat → final projection to 128. The reference wraps the backbone in
  ``no_grad`` here (multi_scale_dino.py:88-90) so its injected LoRA is
  gradient-dead — reproduced with ``stop_gradient``.

Both operate on a single (H, W, 3) image in [0,1]; ImageNet normalization is
applied internally (the reference's transform, train.py:127-131). Point
lookup (``sample_features_at_points``) lives in ops.interp.grid_sample — the
canonical version of the reference's three duplicated grid_sample wrappers.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models.lora import TorchDense
from nerf_fewshot_tpu.models.vit import DINOv2ViT, ViTConfig, normalize_image
from nerf_fewshot_tpu.ops.interp import resize_bilinear


class TorchMHA(nn.Module):
    """torch ``nn.MultiheadAttention(batch_first=True)``-equivalent
    self-attention over (T, E) tokens (packed qkv + out projection)."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        T, E = x.shape
        H = self.num_heads
        hd = E // H
        q = TorchDense(E, name="q")(x)
        k = TorchDense(E, name="k")(x)
        v = TorchDense(E, name="v")(x)
        q = q.reshape(T, H, hd).transpose(1, 0, 2)
        k = k.reshape(T, H, hd).transpose(1, 0, 2)
        v = v.reshape(T, H, hd).transpose(1, 0, 2)
        att = jax.nn.softmax(
            jnp.einsum("htd,hsd->hts", q, k) / jnp.sqrt(hd).astype(x.dtype),
            axis=-1,
        )
        out = jnp.einsum("hts,hsd->htd", att, v).transpose(1, 0, 2).reshape(T, E)
        return TorchDense(E, name="out")(out)


class SpatialDINOFeatures(nn.Module):
    """Single-scale extractor: image (H, W, 3) in [0,1] → (Hp, Wp, 64)."""

    vit: ViTConfig = ViTConfig()
    image_size: int = 128
    pos_embed_dim: int = 64
    output_dim: int = 64

    @nn.compact
    def __call__(self, image: jnp.ndarray, deterministic: bool = True):
        x = normalize_image(image)
        tokens = DINOv2ViT(self.vit, name="backbone")(
            x, deterministic=deterministic
        )
        patches = tokens[1:]  # drop CLS (dino_feature_model.py:101)
        side = self.image_size // self.vit.patch_size
        grid = patches.reshape(side, side, self.vit.hidden_size)

        pos = self.param(
            "spatial_pos_embed",
            nn.initializers.normal(1.0),
            (side * side, self.pos_embed_dim),
        )
        grid = jnp.concatenate(
            [grid, pos.reshape(side, side, self.pos_embed_dim)], axis=-1
        )
        h = nn.relu(TorchDense(256, name="proj_0")(grid))
        h = nn.relu(TorchDense(128, name="proj_1")(h))
        return TorchDense(self.output_dim, name="proj_2")(h)


class MultiScaleDINOFeatures(nn.Module):
    """Multi-scale extractor: image (H, W, 3) in [0,1] → (Hp, Wp, 128)."""

    vit: ViTConfig = ViTConfig()
    scales: Tuple[int, ...] = (1, 2, 4)
    output_dim: int = 128

    @nn.compact
    def __call__(self, image: jnp.ndarray, deterministic: bool = True):
        x = normalize_image(image)
        backbone = DINOv2ViT(self.vit, name="backbone")
        mha = TorchMHA(128, 8, name="cross_scale_attention")

        per_scale = []
        for scale in self.scales:
            if scale == 1:
                xs = x
            else:
                H, W, _ = x.shape
                xs = resize_bilinear(x, H // scale, W // scale)
            # Backbone under stop_gradient: the reference's no_grad
            # (multi_scale_dino.py:88-90) makes the ViT (and its LoRA)
            # gradient-dead in this path; only the fusion stack trains.
            tokens = jax.lax.stop_gradient(
                backbone(xs, deterministic=deterministic)
            )
            patches = tokens[1:]
            side = xs.shape[0] // self.vit.patch_size
            grid = patches.reshape(side, side, self.vit.hidden_size)
            proj = nn.relu(TorchDense(256, name=f"scale_{scale}_proj0")(grid))
            proj = TorchDense(128, name=f"scale_{scale}_proj1")(proj)

            attended = mha(proj.reshape(side * side, 128)).reshape(side, side, 128)
            per_scale.append(attended)

        target = per_scale[0].shape[0]
        aligned = [per_scale[0]]
        for feat in per_scale[1:]:
            aligned.append(resize_bilinear(feat, target, target))
        cat = jnp.concatenate(aligned, axis=-1)
        h = nn.relu(TorchDense(256, name="final_proj0")(cat))
        return TorchDense(self.output_dim, name="final_proj1")(h)


class LoRADINO(nn.Module):
    """Minimal LoRA-DINO wrapper: preprocessed pixel values → full token
    sequence (CLS included), the reference's ``dino_lora.LoRADINO`` surface
    (reference: src/models/dino_lora.py:34-57 — frozen DINOv2 with LoRA
    injected into q/k/v, default r=4/α=16). Used by the offline feature
    dumper (extract_features.py:20-35); the spatial extractors above are
    the training-path variants.

    The input is the *processor output* — apply
    :func:`models.vit.preprocess_dinov2_processor_input` first, exactly as
    the reference forwards ``processor(images=x)`` into the backbone
    (dino_lora.py:51-56)."""

    vit: ViTConfig = ViTConfig(lora_rank=4)

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        return DINOv2ViT(self.vit, name="backbone")(
            pixel_values, deterministic=deterministic
        )


def _merge_pretrained_backbone(variables, model_name: str):
    """Weight-discovery chain for DINOv2 backbones: $NERF_DINOV2_WEIGHTS →
    HF hub cache → merge via load_hf_dinov2_weights. No-op when nothing is
    on disk (zero-egress environments run random-init). Mirrors the
    reference's AutoModel.from_pretrained resolution
    (dino_feature_model.py:38-39)."""
    from nerf_fewshot_tpu.models.vit import (
        find_dinov2_weights,
        load_hf_dinov2_weights,
        load_state_dict_file,
    )

    path = find_dinov2_weights(model_name)
    if path is None:
        return variables, False
    sd = load_state_dict_file(path)
    params = dict(variables["params"])
    params["backbone"] = load_hf_dinov2_weights(params["backbone"], sd)
    print(f"[dino] loaded pretrained backbone weights from {path}")
    return {**variables, "params": params}, True


def build_feature_extractor(
    dino_cfg, image_size: int, vit: ViTConfig = None
) -> Tuple[Callable, Any]:
    """Construct the configured extractor; returns (apply_fn, variables).

    ``apply_fn(variables, image01)`` maps an (H, W, 3) [0,1] image to its
    feature grid. Pretrained backbone weights are discovered automatically
    ($NERF_DINOV2_WEIGHTS / $NERF_VIT_B16_WEIGHTS, then the HF/torch hub
    caches) and merged into ``variables['params']['backbone']`` via
    models.vit.load_hf_dinov2_weights; absent weights leave the seeded
    random init (zero-egress behavior).
    """
    if dino_cfg.model_type == "dino_lora":
        # The reference's offline token dumper (extract_features.py:20-35):
        # LoRADINO over the full processor chain; apply_fn returns the FULL
        # (1 + Hp·Wp, hidden) token sequence — the dump site strips CLS,
        # matching the reference's features[:, 1:] split of responsibilities.
        from nerf_fewshot_tpu.models.vit import (
            preprocess_dinov2_processor_input,
        )

        rank = dino_cfg.lora_rank if dino_cfg.lora_rank > 0 else 4
        model = LoRADINO(
            vit=ViTConfig(lora_rank=rank, lora_alpha=dino_cfg.lora_alpha)
        )
        dummy = jnp.zeros((224, 224, 3))
        variables = model.init(jax.random.key(0), dummy)
        variables, _ = _merge_pretrained_backbone(variables, dino_cfg.name)
        token_fn = jax.jit(model.apply)

        def apply(variables, image01):
            x = preprocess_dinov2_processor_input(image01)
            return token_fn(variables, jnp.asarray(x))

        return apply, variables

    if dino_cfg.model_type == "patch_embed":
        # The standalone scripts' actual feature source: torchvision
        # ViT-B/16 patch-embedding conv only, on a 224×224 mean/std-0.5
        # normalized input (reference: train_baseline.py:33-40,55-64).
        # Preprocessing (PIL resize + uint8 quantization) is host-side;
        # the conv runs jitted.
        from nerf_fewshot_tpu.models.vit import (
            ViTPatchEmbed,
            preprocess_vit_b16_input,
        )

        model = ViTPatchEmbed()
        dummy = jnp.zeros((224, 224, 3))
        variables = model.init(jax.random.key(0), dummy)
        # discovery: the scripts' vit_b_16(weights=DEFAULT) cache
        from nerf_fewshot_tpu.models.vit import (
            find_torchvision_vit_b16_weights,
            load_state_dict_file,
            load_torchvision_patch_embed,
        )

        tv_path = find_torchvision_vit_b16_weights()
        if tv_path is not None:
            sd = load_state_dict_file(tv_path)
            variables = {
                **variables,
                "params": load_torchvision_patch_embed(
                    variables["params"], sd
                ),
            }
            print(f"[dino] loaded vit_b_16 patch-embed weights from {tv_path}")

        conv_fn = jax.jit(model.apply)

        def apply(variables, image01):
            x = preprocess_vit_b16_input(image01)
            return conv_fn(variables, jnp.asarray(x))

        return apply, variables

    if vit is None:
        vit = ViTConfig(
            lora_rank=dino_cfg.lora_rank if dino_cfg.use_lora else 0,
            lora_alpha=dino_cfg.lora_alpha,
        )
    if dino_cfg.model_type == "multi_scale":
        model = MultiScaleDINOFeatures(vit=vit)
    else:
        model = SpatialDINOFeatures(vit=vit, image_size=image_size)
    dummy = jnp.zeros((image_size, image_size, 3))
    variables = model.init(jax.random.key(0), dummy)
    variables, _ = _merge_pretrained_backbone(variables, dino_cfg.name)

    @jax.jit  # one compile, reused per view (eager ViT dispatch is slow)
    def apply_fn(variables, image01):
        return model.apply(variables, image01)

    def apply(variables, image01):
        return apply_fn(variables, jnp.asarray(image01, jnp.float32))

    return apply, variables
