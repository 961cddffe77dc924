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

def test_dinov2_processor_preprocessing_matches_hf_oracle():
    """preprocess_dinov2_processor_input vs the REAL transformers
    BitImageProcessor (constructed with dinov2-base's published constants —
    no network needed) composed after the dumper's torchvision transform
    (reference: extract_features.py:15-21 + dino_lora.py:49-52). Pins the
    double-rescale quirk: the backbone sees values in [0, 1/255] before
    ImageNet normalization."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from PIL import Image as PILImage
    from nerf_fewshot_tpu.models.vit import preprocess_dinov2_processor_input

    proc = transformers.BitImageProcessor(
        do_resize=True, size={"shortest_edge": 256}, resample=3,
        do_center_crop=True, crop_size={"height": 224, "width": 224},
        do_rescale=True, rescale_factor=1 / 255, do_normalize=True,
        image_mean=[0.485, 0.456, 0.406], image_std=[0.229, 0.224, 0.225],
        do_convert_rgb=True,
    )
    rng = np.random.default_rng(11)
    img01 = rng.uniform(0, 1, (128, 160, 3)).astype(np.float32)

    # the dumper's load_image: ToPILImage(trunc) → Resize((224,224)) → ToTensor
    u8 = (img01 * 255.0).astype(np.uint8)
    pil = PILImage.fromarray(u8).resize((224, 224), PILImage.BILINEAR)
    tens = torch.from_numpy(
        np.asarray(pil).astype(np.float32) / 255.0
    ).permute(2, 0, 1)
    want = proc(images=tens, return_tensors="pt")["pixel_values"][0]
    want = want.permute(1, 2, 0).numpy()

    got = preprocess_dinov2_processor_input(img01)
    assert got.shape == (224, 224, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # the double-rescale quirk: un-normalized values sit in [0, 1/255]
    un = got * np.array([0.229, 0.224, 0.225]) + np.array([0.485, 0.456, 0.406])
    assert un.max() <= 1.0 / 255.0 + 1e-5


def test_dino_lora_token_extractor():
    """build_feature_extractor('dino_lora') → full (1+256, 768) token
    sequence at 224/14 patches; LoRA params injected at q/k/v with the
    reference's default rank 4 (dino_lora.py:34)."""
    from nerf_fewshot_tpu.models.dino import build_feature_extractor
    from nerf_fewshot_tpu.training.config import config_from_dict

    cfg = config_from_dict({
        "model": {"use_dino": True, "dino_model_type": "dino_lora"},
    })
    apply, variables = build_feature_extractor(cfg.dino, image_size=64)
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    tokens = np.asarray(apply(variables, img))
    assert tokens.shape == (1 + 16 * 16, 768)  # 224/14 = 16 per side
    assert np.isfinite(tokens).all()
    # LoRA injected into attention q/k/v (reference injects exactly there,
    # dino_lora.py:44-48)
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"], sep="/")
    lora_keys = [k for k in flat if "lora_a" in k]
    assert lora_keys, "no LoRA params in the dino_lora extractor"
    assert any("query/lora_a" in k for k in lora_keys)
    assert any("key/lora_a" in k for k in lora_keys)
    assert any("value/lora_a" in k for k in lora_keys)
    rank4 = [k for k in lora_keys if flat[k].shape[-1] == 4]
    assert rank4, "LoRA rank is not the reference default 4"


def test_cli_extract_features_dino_lora(tmp_path, monkeypatch, capsys):
    """extract-features with dino.model_type=dino_lora dumps CLS-stripped
    patch tokens (V, 256, 768) — the reference's features[:, 1:] output
    (extract_features.py:33-35)."""
    import yaml as _yaml
    from nerf_fewshot_tpu.cli import main

    cfg = {
        "experiment": {"name": "dump"},
        "data": {"resolution": 32, "num_views": 2},
        "model": {"use_dino": True, "dino_model_type": "dino_lora"},
        "output": {"save_dir": str(tmp_path / "out")},
    }
    cfg_path = tmp_path / "dump.yaml"
    cfg_path.write_text(_yaml.safe_dump(cfg))
    out = str(tmp_path / "tokens.npz")
    main(["extract-features", "--config", str(cfg_path), "--synthetic",
          "--output", out])
    data = np.load(out)["features"]
    assert data.shape == (2, 256, 768)
    assert np.isfinite(data).all()
    # and training with the dumper extractor is rejected with a clear error
    with pytest.raises(SystemExit, match="token dumper"):
        main(["train", "--config", str(cfg_path), "--synthetic",
              "--epochs", "1"])
