"""Import reference PyTorch checkpoints into this framework's param trees.

The parity gate (BASELINE.md) requires rendering with the *reference's*
weights; this maps the torch ``state_dict`` layouts the reference saves
(reference: train.py:374-389 key ``nerf_model_state_dict``;
train_multiscale.py:366-378 key ``nerf_state_dict``) into our flax trees.

Supported layouts:
* baseline functional MLP (reference: src/models/nerf_model.py:5-24):
  ``layers.{i}.weight/bias``, ``sigma_out.*``, ``rgb_out.*`` → NeRFMLP
  ``trunk_{i}``, ``sigma_head``, ``rgb_head``.
* implied DINO/LoRA NeRFMLP (same trunk names + ``lora_A/lora_B`` pairs).
* NeRFWithDINO module stack (reference: src/models/nerf_mlp.py:86-158).

All torch ``Linear.weight`` tensors are (out, in) and transpose into flax
(in, out) kernels.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _detached_numpy(state_dict: Dict) -> Dict:
    """Copy a torch state_dict to owned numpy arrays.

    The copy matters: ``np.asarray(tensor)`` shares storage with the live
    torch parameter, and ``jnp.asarray`` of a contiguous f32 numpy array can
    zero-copy alias it on the CPU backend — so a later torch
    ``optimizer.step()`` would silently mutate the "imported" JAX params
    (observed as a 3e-4 loss drift in the trajectory-parity test before
    this copy existed).
    """
    return {k: np.array(v, copy=True) for k, v in state_dict.items()}


def _put_linear(tree: Dict, sd: Dict, torch_prefix: str) -> None:
    w = sd.get(f"{torch_prefix}.weight")
    b = sd.get(f"{torch_prefix}.bias")
    if w is not None:
        tree["kernel"] = jnp.asarray(np.asarray(w).T)
    if b is not None:
        tree["bias"] = jnp.asarray(np.asarray(b))


def import_nerf_mlp_state_dict(params: Dict, state_dict: Dict) -> Dict:
    """Map a reference NeRF-MLP state_dict onto a models.mlp.NeRFMLP tree.

    Handles the trunk as either ``layers.{i}`` (nerf_model.py naming) or
    ``trunk.{i}``; heads as ``sigma_out``/``rgb_out``. LoRA pairs
    ``layers.{i}.lora_A/lora_B`` land in ``trunk_{i}/lora_a|lora_b`` (with
    the base Linear under ``trunk_{i}/base``). Unmatched framework leaves
    keep their current values.
    """
    import copy

    params = copy.deepcopy(jax_tree_to_mutable(params))
    sd = _detached_numpy(state_dict)

    i = 0
    while True:
        prefix = None
        for cand in (f"layers.{i}", f"trunk.{i}"):
            if f"{cand}.weight" in sd or f"{cand}.original.weight" in sd:
                prefix = cand
                break
        if prefix is None:
            break
        tkey = f"trunk_{i}"
        if tkey not in params:
            break
        layer = params[tkey]
        if "base" in layer:  # LoRADense layout
            if f"{prefix}.original.weight" in sd:
                _put_linear(layer["base"], sd, f"{prefix}.original")
            else:
                _put_linear(layer["base"], sd, prefix)
            if f"{prefix}.lora_A.weight" in sd:
                layer["lora_a"] = jnp.asarray(sd[f"{prefix}.lora_A.weight"].T)
                layer["lora_b"] = jnp.asarray(sd[f"{prefix}.lora_B.weight"].T)
        else:
            _put_linear(layer, sd, prefix)
        i += 1

    if "sigma_out.weight" in sd:
        _put_linear(params["sigma_head"], sd, "sigma_out")
    if "rgb_out.weight" in sd:
        _put_linear(params["rgb_head"], sd, "rgb_out")
    return params


def import_nerf_with_dino_state_dict(params: Dict, state_dict: Dict) -> Dict:
    """Map a reference NeRFWithDINO state_dict onto a NeRFWithDINO tree
    (fusion + density MLP + color MLP naming per nerf_mlp.py)."""
    import copy

    params = copy.deepcopy(jax_tree_to_mutable(params))
    sd = _detached_numpy(state_dict)

    fz = params["dino_fusion"]
    _put_linear(fz["fusion_0"], sd, "dino_fusion.fusion.0")
    _put_linear(fz["fusion_1"], sd, "dino_fusion.fusion.2")
    _put_linear(fz["attention_0"], sd, "dino_fusion.attention.0")
    _put_linear(fz["attention_1"], sd, "dino_fusion.attention.2")
    _put_linear(fz["output_proj"], sd, "dino_fusion.output_proj")

    dm = params["density_mlp"]
    i = 0
    # torch Sequential interleaves ReLU: Linear indices 0, 2, 4, ...
    while f"density_mlp.density_layers.{2 * i}.weight" in sd:
        _put_linear(dm[f"layer_{i}"], sd, f"density_mlp.density_layers.{2 * i}")
        i += 1
    _put_linear(dm["density_head"], sd, "density_mlp.density_head")
    _put_linear(dm["feature_head"], sd, "density_mlp.feature_head")

    cm = params["color_mlp"]
    _put_linear(cm["layer_0"], sd, "color_mlp.color_layers.0")
    _put_linear(cm["layer_1"], sd, "color_mlp.color_layers.2")
    _put_linear(cm["rgb"], sd, "color_mlp.color_layers.4")
    return params


def jax_tree_to_mutable(tree: Any) -> Any:
    """Deep-copy a (possibly frozen) param tree into plain nested dicts."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: jax_tree_to_mutable(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path: str) -> Dict:
    """Load a reference ``.pth`` checkpoint dict on CPU (torch required)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return {
        k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in ckpt.items()
    } if not isinstance(ckpt, dict) or "epoch" not in ckpt else ckpt
