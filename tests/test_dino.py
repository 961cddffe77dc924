"""DINO/ViT stack tests: attention parity with torch, extractor output
shapes, LoRA injection, gradient-death of the multi-scale backbone
(reproducing multi_scale_dino.py:88-90), and HF weight-import mapping."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models.dino import (
    MultiScaleDINOFeatures,
    SpatialDINOFeatures,
    TorchMHA,
)
from nerf_fewshot_tpu.models.vit import (
    DINOv2ViT,
    ViTConfig,
    load_hf_dinov2_weights,
)

RNG = np.random.default_rng(3)

TINY = ViTConfig(
    hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64, patch_size=8,
    base_image_size=64,
)


def test_torch_mha_parity():
    """Our MHA must match torch nn.MultiheadAttention given the same
    weights."""
    E, H, T = 16, 4, 10
    x = RNG.standard_normal((T, E)).astype(np.float32)
    mod = TorchMHA(E, H)
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]

    tm = torch.nn.MultiheadAttention(E, H, batch_first=True)
    qw = np.asarray(params["q"]["kernel"]).T
    kw = np.asarray(params["k"]["kernel"]).T
    vw = np.asarray(params["v"]["kernel"]).T
    with torch.no_grad():
        tm.in_proj_weight.copy_(torch.from_numpy(np.concatenate([qw, kw, vw], 0)))
        tm.in_proj_bias.copy_(
            torch.from_numpy(
                np.concatenate(
                    [
                        np.asarray(params["q"]["bias"]),
                        np.asarray(params["k"]["bias"]),
                        np.asarray(params["v"]["bias"]),
                    ]
                )
            )
        )
        tm.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(params["out"]["kernel"]).T)
        )
        tm.out_proj.bias.copy_(torch.from_numpy(np.asarray(params["out"]["bias"])))

    got = mod.apply({"params": params}, jnp.asarray(x))
    xt = torch.from_numpy(x)[None]
    want, _ = tm(xt, xt, xt)
    np.testing.assert_allclose(
        np.asarray(got), want[0].detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_vit_token_shapes_and_finite():
    model = DINOv2ViT(TINY)
    img = jnp.asarray(RNG.standard_normal((32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)["params"]
    out = model.apply({"params": params}, img)
    assert out.shape == (1 + 4 * 4, 32)  # CLS + (32/8)² patches
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vit_pos_embed_interpolation():
    """Different input sizes share one pos table via interpolation."""
    model = DINOv2ViT(TINY)
    img32 = jnp.zeros((32, 32, 3))
    params = model.init(jax.random.key(0), img32)["params"]
    out16 = model.apply({"params": params}, jnp.zeros((16, 16, 3)))
    assert out16.shape == (1 + 2 * 2, 32)


def test_vit_lora_injection_and_labels():
    cfg = ViTConfig(
        hidden_size=32, num_layers=2, num_heads=4, mlp_dim=64, patch_size=8,
        base_image_size=64, lora_rank=4,
    )
    model = DINOv2ViT(cfg)
    img = jnp.zeros((32, 32, 3))
    params = model.init(jax.random.key(0), img)["params"]
    # every layer's q/k/v gains lora_a/lora_b (reference injection points,
    # dino_feature_model.py:68-75)
    for i in range(2):
        for proj in ("query", "key", "value"):
            leaf = params[f"block_{i}"]["attention"][proj]
            assert "lora_a" in leaf and "lora_b" in leaf
    out = model.apply({"params": params}, img)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_spatial_extractor_shapes():
    model = SpatialDINOFeatures(vit=TINY, image_size=32)
    img = jnp.asarray(RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)["params"]
    feats = model.apply({"params": params}, img)
    assert feats.shape == (4, 4, 64)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_multiscale_extractor_shapes():
    model = MultiScaleDINOFeatures(vit=TINY)
    img = jnp.asarray(RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)["params"]
    feats = model.apply({"params": params}, img)
    assert feats.shape == (4, 4, 128)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_multiscale_backbone_gradient_dead():
    """The multi-scale path's backbone is under stop_gradient (reference
    no_grad, multi_scale_dino.py:88-90): backbone grads must be exactly zero
    while fusion grads are not."""
    model = MultiScaleDINOFeatures(vit=TINY)
    img = jnp.asarray(RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), img)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, img) ** 2)

    g = jax.grad(loss)(params)
    backbone_norm = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["backbone"])
    )
    fusion_norm = sum(
        float(jnp.abs(x).sum())
        for k, v in g.items()
        if k != "backbone"
        for x in jax.tree_util.tree_leaves(v)
    )
    assert backbone_norm == 0.0
    assert fusion_norm > 0.0


def test_hf_weight_import_mapping():
    """A synthetic HF-style state_dict must land in the right leaves."""
    model = DINOv2ViT(TINY)
    img = jnp.zeros((32, 32, 3))
    params = model.init(jax.random.key(0), img)["params"]

    sd = {}
    E, M, P = 32, 64, 8
    sd["embeddings.cls_token"] = RNG.standard_normal((1, 1, E)).astype(np.float32)
    base_side = 64 // 8
    sd["embeddings.position_embeddings"] = RNG.standard_normal(
        (1, 1 + base_side * base_side, E)
    ).astype(np.float32)
    sd["embeddings.patch_embeddings.projection.weight"] = RNG.standard_normal(
        (E, 3, P, P)
    ).astype(np.float32)
    sd["embeddings.patch_embeddings.projection.bias"] = RNG.standard_normal(
        (E,)
    ).astype(np.float32)
    for i in range(2):
        p = f"encoder.layer.{i}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = RNG.standard_normal((E,)).astype(np.float32)
            sd[f"{p}.{n}.bias"] = RNG.standard_normal((E,)).astype(np.float32)
        for proj in ("query", "key", "value"):
            sd[f"{p}.attention.attention.{proj}.weight"] = RNG.standard_normal(
                (E, E)
            ).astype(np.float32)
            sd[f"{p}.attention.attention.{proj}.bias"] = RNG.standard_normal(
                (E,)
            ).astype(np.float32)
        sd[f"{p}.attention.output.dense.weight"] = RNG.standard_normal(
            (E, E)
        ).astype(np.float32)
        sd[f"{p}.attention.output.dense.bias"] = RNG.standard_normal((E,)).astype(
            np.float32
        )
        sd[f"{p}.mlp.fc1.weight"] = RNG.standard_normal((M, E)).astype(np.float32)
        sd[f"{p}.mlp.fc1.bias"] = RNG.standard_normal((M,)).astype(np.float32)
        sd[f"{p}.mlp.fc2.weight"] = RNG.standard_normal((E, M)).astype(np.float32)
        sd[f"{p}.mlp.fc2.bias"] = RNG.standard_normal((E,)).astype(np.float32)
        sd[f"{p}.layer_scale1.lambda1"] = RNG.standard_normal((E,)).astype(
            np.float32
        )
        sd[f"{p}.layer_scale2.lambda1"] = RNG.standard_normal((E,)).astype(
            np.float32
        )
    sd["layernorm.weight"] = RNG.standard_normal((E,)).astype(np.float32)
    sd["layernorm.bias"] = RNG.standard_normal((E,)).astype(np.float32)

    new = load_hf_dinov2_weights(params, sd)
    np.testing.assert_allclose(
        np.asarray(new["cls_token"]), sd["embeddings.cls_token"].reshape(1, E)
    )
    np.testing.assert_allclose(
        np.asarray(new["block_0"]["attention"]["query"]["kernel"]),
        sd["encoder.layer.0.attention.attention.query.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(new["block_1"]["mlp"]["fc1"]["kernel"]),
        sd["encoder.layer.1.mlp.fc1.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(new["block_0"]["layerscale1"]),
        sd["encoder.layer.0.layer_scale1.lambda1"],
    )
    # imported tree still runs
    out = DINOv2ViT(TINY).apply({"params": new}, jnp.zeros((32, 32, 3)))
    assert bool(jnp.all(jnp.isfinite(out)))
