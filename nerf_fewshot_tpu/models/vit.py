"""DINOv2-style Vision Transformer backbone in flax, with LoRA-injectable
q/k/v projections.

Replaces the reference's HuggingFace ``facebook/dinov2-base`` dependency
(reference: src/models/dino_feature_model.py:38-39) with a native JAX ViT:
patch-embedding conv (patch 14, stride 14), CLS token, bicubic-interpolated
position embeddings, pre-LN transformer blocks (GELU MLP, LayerScale — the
DINOv2 block layout), final LayerNorm. Pretrained HF weights can be imported
with :func:`load_hf_dinov2_weights` when a torch state_dict is available on
disk (zero-egress environments without a weight cache run the architecture
randomly initialized — sufficient for the framework's pipeline, tests, and
benchmarks; feature *quality* then differs from pretrained DINO).

LoRA mirrors the reference's injection points: every encoder layer's
query/key/value projections (reference: dino_feature_model.py:68-75).

TPU notes: token counts here are tiny (81-256); everything runs as dense
(tokens × hidden) MXU matmuls under one jit. bfloat16-friendly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_fewshot_tpu.models.lora import LoRADense, TorchDense

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 14
    layernorm_eps: float = 1e-6
    use_layerscale: bool = True  # DINOv2 blocks carry LayerScale
    layerscale_init: float = 1.0
    lora_rank: int = 0
    lora_alpha: float = 16.0
    base_image_size: int = 518  # DINOv2 pretraining grid (37×37 patches)


def _maybe_lora(cfg: ViTConfig, features: int, name: str):
    if cfg.lora_rank > 0:
        return LoRADense(
            features, rank=cfg.lora_rank, alpha=cfg.lora_alpha, name=name
        )
    return TorchDense(features, name=name)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        T, E = x.shape
        H = c.num_heads
        hd = E // H

        def proj(layer, v):
            if isinstance(layer, LoRADense):
                return layer(v, deterministic=deterministic)
            return layer(v)

        q = proj(_maybe_lora(c, E, "query"), x)
        k = proj(_maybe_lora(c, E, "key"), x)
        v = proj(_maybe_lora(c, E, "value"), x)

        q = q.reshape(T, H, hd).transpose(1, 0, 2)  # (H, T, hd)
        k = k.reshape(T, H, hd).transpose(1, 0, 2)
        v = v.reshape(T, H, hd).transpose(1, 0, 2)

        att = jnp.einsum("htd,hsd->hts", q, k) / jnp.sqrt(hd).astype(x.dtype)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("hts,hsd->htd", att, v)
        out = out.transpose(1, 0, 2).reshape(T, E)
        return TorchDense(E, name="out")(out)


class MLP(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        h = TorchDense(self.cfg.mlp_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return TorchDense(self.cfg.hidden_size, name="fc2")(h)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layernorm_eps, name="norm1")(x)
        h = Attention(c, name="attention")(h, deterministic=deterministic)
        if c.use_layerscale:
            ls1 = self.param(
                "layerscale1",
                nn.initializers.constant(c.layerscale_init),
                (c.hidden_size,),
            )
            h = h * ls1
        x = x + h
        h = nn.LayerNorm(epsilon=c.layernorm_eps, name="norm2")(x)
        h = MLP(c, name="mlp")(h)
        if c.use_layerscale:
            ls2 = self.param(
                "layerscale2",
                nn.initializers.constant(c.layerscale_init),
                (c.hidden_size,),
            )
            h = h * ls2
        return x + h


def _interpolate_pos_embed(pos: jnp.ndarray, n_side: int) -> jnp.ndarray:
    """Resize the (1 + S²) position table to (1 + n_side²) tokens by bilinear
    grid interpolation of the patch part (CLS entry passes through)."""
    from nerf_fewshot_tpu.ops.interp import resize_bilinear

    cls_pos, patch_pos = pos[:1], pos[1:]
    s = int(np.sqrt(patch_pos.shape[0]))
    if s == n_side:
        return pos
    grid = patch_pos.reshape(s, s, -1)
    grid = resize_bilinear(grid, n_side, n_side, align_corners=False)
    return jnp.concatenate([cls_pos, grid.reshape(n_side * n_side, -1)], axis=0)


class DINOv2ViT(nn.Module):
    """Backbone over one image (H, W, 3), already ImageNet-normalized.

    Returns the full token sequence (1 + Hp*Wp, hidden) after the final
    LayerNorm (HF ``last_hidden_state`` layout: CLS first, reference drops it
    at dino_feature_model.py:101)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, deterministic: bool = True):
        c = self.cfg
        H, W, _ = image.shape
        p = c.patch_size
        Hp, Wp = H // p, W // p

        patches = nn.Conv(
            features=c.hidden_size,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            name="patch_embed",
        )(image[None])[0]
        tokens = patches.reshape(Hp * Wp, c.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, c.hidden_size)
        )
        tokens = jnp.concatenate([cls, tokens], axis=0)

        base_side = c.base_image_size // p
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1 + base_side * base_side, c.hidden_size),
        )
        tokens = tokens + _interpolate_pos_embed(pos, Hp)

        for i in range(c.num_layers):
            tokens = Block(c, name=f"block_{i}")(
                tokens, deterministic=deterministic
            )
        return nn.LayerNorm(epsilon=c.layernorm_eps, name="norm")(tokens)


def normalize_image(image: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalize an (H, W, 3) [0,1] image (the reference's
    image_transform, train.py:127-131)."""
    return (image - IMAGENET_MEAN) / IMAGENET_STD


class ViTPatchEmbed(nn.Module):
    """torchvision ViT-B/16 **patch-embedding-only** feature extractor — the
    standalone scripts' actual "DINO" (reference: src/training/
    train_baseline.py:33,55-64, train_lora.py:48,72-80): despite the naming,
    those scripts run ``vit_b_16(...)._process_input(img)``, which is just the
    patch-embedding conv (3→768, kernel 16, stride 16), *pre-transformer* —
    no CLS token, no position embedding, no encoder blocks. On a 224×224
    input this yields a 14×14×768 feature grid.

    Input must already be preprocessed (resized to ``input_size`` and
    normalized with mean/std 0.5 — see :func:`preprocess_vit_b16_input`).
    """

    hidden_dim: int = 768
    patch_size: int = 16

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        patches = nn.Conv(
            features=self.hidden_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            name="conv_proj",
        )(image[None])[0]
        return patches  # (H/p, W/p, hidden_dim)


def preprocess_vit_b16_input(image01: np.ndarray, size: int = 224) -> np.ndarray:
    """Host-side preprocessing matching the standalone scripts' transform
    (reference: train_baseline.py:34-40): ``ToPILImage → Resize((224,224),
    bilinear) → ToTensor → Normalize(mean=0.5, std=0.5)``.

    ToPILImage quantizes the [0,1] float image to uint8 by truncation
    (``mul(255).byte()``), PIL's bilinear resize re-quantizes the result —
    both quantizations are reproduced exactly by round-tripping through PIL.
    Returns an (size, size, 3) float32 array in [-1, 1].
    """
    from PIL import Image

    arr = np.asarray(image01)
    u8 = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)  # torch .byte() truncation
    img = Image.fromarray(u8).resize((size, size), Image.BILINEAR)
    out = np.asarray(img, np.float32) / 255.0
    return (out - 0.5) / 0.5


def preprocess_dinov2_processor_input(image01: np.ndarray) -> np.ndarray:
    """The reference offline feature dumper's EXACT host preprocessing
    (reference: src/training/extract_features.py:15-21 load_image transform
    + src/models/dino_lora.py:49-52 processor call).

    Two chained stages, both reproduced bit-for-bit (verified against the
    real ``transformers.BitImageProcessor`` with dinov2-base's published
    constants in tests/test_dino.py):

    1. ``ToPILImage → Resize((224,224), bilinear) → ToTensor`` — uint8
       truncation then PIL resize; output [0,1].
    2. The HF ``AutoImageProcessor`` applied to that *already-rescaled*
       tensor: PIL round-trip (float [0,1] → ×255 trunc → uint8), bicubic
       resize shortest-edge 256, center-crop 224, then ``rescale(1/255)``
       AGAIN — the reference double-rescales, so the backbone sees values in
       [0, 1/255] before ImageNet normalization (≈ a uniformly dark image).
       This quirk shapes every published token dump and is reproduced
       deliberately.

    Returns a (224, 224, 3) float32 array.
    """
    from PIL import Image

    arr = np.asarray(image01)
    # stage 1: the dumper's torchvision transform
    u8 = (np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)  # trunc (.byte())
    x = np.asarray(
        Image.fromarray(u8).resize((224, 224), Image.BILINEAR), np.float32
    ) / 255.0
    # stage 2: BitImageProcessor on the [0,1] tensor. to_pil_image rescales
    # ×255 with truncation, resizes shortest-edge→256 bicubic, rescales the
    # PIL trip back (÷255), center-crops 224, then applies the processor's
    # own rescale_factor=1/255 — the double-rescale.
    u8 = np.clip(np.floor(x * 255.0), 0, 255).astype(np.uint8)
    x = np.asarray(
        Image.fromarray(u8).resize((256, 256), Image.BICUBIC), np.float32
    ) / 255.0
    top = (256 - 224) // 2
    x = x[top:top + 224, top:top + 224]
    x = x * (1.0 / 255.0)
    return ((x - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def load_torchvision_patch_embed(params, state_dict) -> Any:
    """Map a torchvision ``vit_b_16`` state_dict's patch-embedding conv into
    a :class:`ViTPatchEmbed` param tree (keys ``conv_proj.weight/bias``).
    Missing keys leave the random init in place."""
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")
    if "conv_proj.weight" in state_dict:
        w = np.asarray(state_dict["conv_proj.weight"])  # (out, in, kh, kw)
        k = "conv_proj/kernel"
        if k in flat and flat[k].shape == w.transpose(2, 3, 1, 0).shape:
            flat[k] = jnp.asarray(w.transpose(2, 3, 1, 0))
    if "conv_proj.bias" in state_dict:
        b = np.asarray(state_dict["conv_proj.bias"])
        if "conv_proj/bias" in flat and flat["conv_proj/bias"].shape == b.shape:
            flat["conv_proj/bias"] = jnp.asarray(b)
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def find_dinov2_weights(
    model_name: str = "facebook/dinov2-base",
) -> Optional[str]:
    """Locate a DINOv2 torch state_dict on disk, mirroring where the
    reference's ``AutoModel.from_pretrained`` would find it
    (reference: dino_feature_model.py:38-39): ``$NERF_DINOV2_WEIGHTS``
    first (a direct file path), then the HuggingFace hub cache
    (``$HF_HOME``/``~/.cache/huggingface``) snapshot directories."""
    p = os.environ.get("NERF_DINOV2_WEIGHTS")
    if p and os.path.isfile(p):
        return p
    hub = os.path.join(
        os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface")),
        "hub",
    )
    repo = "models--" + model_name.replace("/", "--")
    snaps = os.path.join(hub, repo, "snapshots")
    if os.path.isdir(snaps):
        for snap in sorted(os.listdir(snaps)):
            for fname in ("pytorch_model.bin", "model.safetensors"):
                cand = os.path.join(snaps, snap, fname)
                if os.path.isfile(cand):
                    return cand
    return None


def load_state_dict_file(path: str) -> dict:
    """Load a torch ``.bin``/``.pth`` or ``.safetensors`` state_dict from
    disk as a dict of numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in sd.items()}


def find_torchvision_vit_b16_weights() -> Optional[str]:
    """Locate a torchvision ``vit_b_16`` checkpoint, mirroring where the
    standalone scripts' ``vit_b_16(weights=DEFAULT)`` caches it
    (reference: train_baseline.py:33): ``$NERF_VIT_B16_WEIGHTS`` first,
    then the torch hub cache."""
    p = os.environ.get("NERF_VIT_B16_WEIGHTS")
    if p and os.path.isfile(p):
        return p
    hub = os.path.join(
        os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch")),
        "hub", "checkpoints",
    )
    if os.path.isdir(hub):
        for name in sorted(os.listdir(hub)):
            if name.startswith("vit_b_16") and name.endswith(".pth"):
                return os.path.join(hub, name)
    return None


def load_hf_dinov2_weights(params, state_dict) -> Any:
    """Map a HuggingFace ``Dinov2Model`` torch state_dict into this module's
    param tree (for parity runs when pretrained weights exist on disk).

    Accepts a dict of numpy arrays keyed by HF names. Unknown keys are
    ignored; missing keys leave the random init in place. LoRA params (absent
    from HF checkpoints) are untouched.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")

    def put(name, value, transpose=False):
        if name in flat:
            v = np.asarray(value)
            if transpose:
                v = v.T
            if flat[name].shape == v.shape:
                flat[name] = jnp.asarray(v)

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    put("cls_token", sd.get("embeddings.cls_token", np.zeros(0)).reshape(1, -1))
    if "embeddings.position_embeddings" in sd:
        put("pos_embed", sd["embeddings.position_embeddings"][0])
    if "embeddings.patch_embeddings.projection.weight" in sd:
        w = sd["embeddings.patch_embeddings.projection.weight"]
        # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
        put("patch_embed/kernel", w.transpose(2, 3, 1, 0))
        put("patch_embed/bias", sd["embeddings.patch_embeddings.projection.bias"])
    n_layers = 0
    while f"encoder.layer.{n_layers}.norm1.weight" in sd:
        n_layers += 1
    for i in range(n_layers):
        hf = f"encoder.layer.{i}"
        fx = f"block_{i}"
        put(f"{fx}/norm1/scale", sd[f"{hf}.norm1.weight"])
        put(f"{fx}/norm1/bias", sd[f"{hf}.norm1.bias"])
        put(f"{fx}/norm2/scale", sd[f"{hf}.norm2.weight"])
        put(f"{fx}/norm2/bias", sd[f"{hf}.norm2.bias"])
        for proj in ("query", "key", "value"):
            w = sd[f"{hf}.attention.attention.{proj}.weight"]
            b = sd[f"{hf}.attention.attention.{proj}.bias"]
            # plain Dense or LoRA base
            put(f"{fx}/attention/{proj}/kernel", w, transpose=True)
            put(f"{fx}/attention/{proj}/bias", b)
            put(f"{fx}/attention/{proj}/base/kernel", w, transpose=True)
            put(f"{fx}/attention/{proj}/base/bias", b)
        put(f"{fx}/attention/out/kernel",
            sd[f"{hf}.attention.output.dense.weight"], transpose=True)
        put(f"{fx}/attention/out/bias", sd[f"{hf}.attention.output.dense.bias"])
        put(f"{fx}/mlp/fc1/kernel", sd[f"{hf}.mlp.fc1.weight"], transpose=True)
        put(f"{fx}/mlp/fc1/bias", sd[f"{hf}.mlp.fc1.bias"])
        put(f"{fx}/mlp/fc2/kernel", sd[f"{hf}.mlp.fc2.weight"], transpose=True)
        put(f"{fx}/mlp/fc2/bias", sd[f"{hf}.mlp.fc2.bias"])
        put(f"{fx}/layerscale1", sd.get(f"{hf}.layer_scale1.lambda1", np.zeros(0)))
        put(f"{fx}/layerscale2", sd.get(f"{hf}.layer_scale2.lambda1", np.zeros(0)))
    put("norm/scale", sd.get("layernorm.weight", np.zeros(0)))
    put("norm/bias", sd.get("layernorm.bias", np.zeros(0)))
    return flax.traverse_util.unflatten_dict(flat, sep="/")
