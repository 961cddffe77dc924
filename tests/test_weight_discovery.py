"""Pretrained-weight DISCOVERY dry run: synthetic-but-complete torch
state_dicts written to fake hub caches, then the full env-var → cache →
loader → merged-params chain exercised end-to-end — proving "point it at
real weights and it just works" without real weights (zero-egress).

Reference resolution points being mirrored:
* lpips VGG16 trunk + linear heads (train.py:99-101) → torch hub cache.
* facebook/dinov2-base (dino_feature_model.py:38-39) → HF hub cache.
* torchvision vit_b_16 DEFAULT weights (train_baseline.py:33) → torch hub.
"""

import os

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from nerf_fewshot_tpu.training.config import config_from_dict

RNG = np.random.default_rng(23)


def _synthetic_vgg16_features_sd():
    """torchvision vgg16().state_dict()'s `features.*` conv keys with the
    real shapes (classifier keys omitted — the LPIPS trunk never reads
    them)."""
    plan = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
    sd = {}
    seq, c_in = 0, 3
    for spec in plan:
        if spec == "M":
            seq += 1
            continue
        sd[f"features.{seq}.weight"] = torch.from_numpy(
            RNG.standard_normal((spec, c_in, 3, 3)).astype(np.float32) * 0.05
        )
        sd[f"features.{seq}.bias"] = torch.from_numpy(
            RNG.standard_normal(spec).astype(np.float32) * 0.01
        )
        seq += 2
        c_in = spec
    return sd


def _synthetic_lpips_heads_sd():
    return {
        f"lin{k}.model.1.weight": torch.from_numpy(
            RNG.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32)
        )
        for k, c in enumerate((64, 128, 256, 512, 512))
    }


def test_lpips_discovery_chain(tmp_path, monkeypatch):
    """TORCH_HOME hub cache + $NERF_LPIPS_HEADS → LPIPS(pretrained=True)
    with a changed distance; Trainer.evaluate then reports
    lpips_pretrained=True."""
    from nerf_fewshot_tpu.training.lpips_jax import LPIPS, find_weight_files

    hub = tmp_path / "torch" / "hub" / "checkpoints"
    hub.mkdir(parents=True)
    vgg_path = hub / "vgg16-397923af.pth"
    torch.save(_synthetic_vgg16_features_sd(), str(vgg_path))
    heads_path = tmp_path / "lpips_vgg_heads.pth"
    torch.save(_synthetic_lpips_heads_sd(), str(heads_path))

    # random-init baseline (no cache visible)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "empty"))
    monkeypatch.delenv("NERF_LPIPS_VGG", raising=False)
    monkeypatch.delenv("NERF_LPIPS_HEADS", raising=False)
    base = LPIPS()
    assert base.pretrained is False

    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch"))
    monkeypatch.setenv("NERF_LPIPS_HEADS", str(heads_path))
    found_vgg, found_heads = find_weight_files()
    assert found_vgg == str(vgg_path) and found_heads == str(heads_path)

    loaded = LPIPS()
    assert loaded.pretrained is True
    # the merged trunk + heads actually flow into the metric
    a = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    d_base, d_loaded = base(a, b), loaded(a, b)
    assert d_loaded != pytest.approx(d_base, rel=1e-3)
    # head weights were taken from the checkpoint, not the uniform 1/C init
    assert not np.allclose(
        np.asarray(loaded.params["lins"][0]["kernel"]),
        np.asarray(base.params["lins"][0]["kernel"]),
    )

    # and through the Trainer: evaluate() emits pretrained provenance
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.trainer import Trainer

    res = 16
    cfg = config_from_dict({
        "experiment": {"name": "lpips-dry"},
        "data": {"resolution": res, "num_views": 2},
        "nerf_model": {"hidden_dim": 32, "num_layers": 2},
        "training": {"epochs": 1, "batch_size": 64,
                     "progressive_schedule": {
                         "epochs_0_50": [res, res, 8],
                         "epochs_50_100": [res, res, 8],
                         "epochs_100_plus": [res, res, 8]}},
        "rendering": {"chunk_size": 128},
        "output": {"save_dir": str(tmp_path / "out")},
    })
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=2, img_size=res, gt_samples=32)
    test = make_scene_dataset(scene, n_views=1, img_size=res, split="test",
                              gt_samples=32)
    m = Trainer(cfg, train, test).evaluate(max_views=1)
    assert m["lpips_pretrained"] is True
    assert m["lpips_backend"] == "jax-pretrained-vgg"


def _partial_dinov2_sd(hidden=768, patch=14, seed=77):
    """A partial facebook/dinov2-base state_dict: embeddings + final
    layernorm with the REAL shapes (encoder blocks omitted — the mapper
    leaves unmatched params at their random init). Deterministic per seed
    so two calls produce identical tensors."""
    RNG = np.random.default_rng(seed)
    side = 518 // patch
    return {
        "embeddings.cls_token": torch.from_numpy(
            RNG.standard_normal((1, 1, hidden)).astype(np.float32) * 0.02),
        "embeddings.position_embeddings": torch.from_numpy(
            RNG.standard_normal((1, 1 + side * side, hidden))
            .astype(np.float32) * 0.02),
        "embeddings.patch_embeddings.projection.weight": torch.from_numpy(
            RNG.standard_normal((hidden, 3, patch, patch))
            .astype(np.float32) * 0.02),
        "embeddings.patch_embeddings.projection.bias": torch.from_numpy(
            RNG.standard_normal(hidden).astype(np.float32) * 0.01),
        "layernorm.weight": torch.from_numpy(
            np.ones(hidden, np.float32) * 1.5),
        "layernorm.bias": torch.from_numpy(
            RNG.standard_normal(hidden).astype(np.float32) * 0.01),
    }


def test_dinov2_discovery_from_hf_hub_cache(tmp_path, monkeypatch):
    """HF_HOME snapshot layout → find_dinov2_weights →
    build_feature_extractor output changes (weights actually merged)."""
    from nerf_fewshot_tpu.models.dino import build_feature_extractor
    from nerf_fewshot_tpu.models.vit import find_dinov2_weights

    snap = (tmp_path / "huggingface" / "hub"
            / "models--facebook--dinov2-base" / "snapshots" / "abc123")
    snap.mkdir(parents=True)
    torch.save(_partial_dinov2_sd(), str(snap / "pytorch_model.bin"))

    cfg = config_from_dict({
        "model": {"use_dino": True, "dino_model_type": "single_scale"},
    })
    img = RNG.uniform(0, 1, (56, 56, 3)).astype(np.float32)

    monkeypatch.setenv("HF_HOME", str(tmp_path / "nothing"))
    monkeypatch.delenv("NERF_DINOV2_WEIGHTS", raising=False)
    assert find_dinov2_weights() is None
    apply0, var0 = build_feature_extractor(cfg.dino, image_size=56)
    f_random = np.asarray(apply0(var0, img))

    monkeypatch.setenv("HF_HOME", str(tmp_path / "huggingface"))
    assert find_dinov2_weights() == str(snap / "pytorch_model.bin")
    apply1, var1 = build_feature_extractor(cfg.dino, image_size=56)
    f_loaded = np.asarray(apply1(var1, img))

    assert f_random.shape == f_loaded.shape == (4, 4, 64)
    assert np.isfinite(f_loaded).all()
    assert np.abs(f_random - f_loaded).max() > 1e-4
    # the merged cls_token matches the checkpoint exactly
    sd = _partial_dinov2_sd()
    np.testing.assert_allclose(
        np.asarray(var1["params"]["backbone"]["cls_token"]),
        sd["embeddings.cls_token"].numpy()[0],
    )

    # env-var direct path wins over the hub cache
    direct = tmp_path / "direct.bin"
    sd2 = _partial_dinov2_sd()
    sd2["layernorm.weight"] = torch.from_numpy(np.ones(768, np.float32) * 2.0)
    torch.save(sd2, str(direct))
    monkeypatch.setenv("NERF_DINOV2_WEIGHTS", str(direct))
    assert find_dinov2_weights() == str(direct)


def test_dinov2_discovery_through_cli(tmp_path, monkeypatch, capsys):
    """extract-features picks up discovered weights: the dumped features
    change when a checkpoint appears in the hub cache (the VERDICT's
    'changed features through the CLI' gate)."""
    import yaml as _yaml
    from nerf_fewshot_tpu.cli import main

    cfg = {
        "experiment": {"name": "disc"},
        "data": {"resolution": 28, "num_views": 1},
        "model": {"use_dino": True, "dino_model_type": "single_scale"},
        "output": {"save_dir": str(tmp_path / "out")},
    }
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(_yaml.safe_dump(cfg))

    monkeypatch.setenv("HF_HOME", str(tmp_path / "nothing"))
    monkeypatch.delenv("NERF_DINOV2_WEIGHTS", raising=False)
    out0 = str(tmp_path / "f0.npz")
    main(["extract-features", "--config", str(cfg_path), "--synthetic",
          "--output", out0])

    snap = (tmp_path / "hf" / "hub" / "models--facebook--dinov2-base"
            / "snapshots" / "s1")
    snap.mkdir(parents=True)
    torch.save(_partial_dinov2_sd(), str(snap / "pytorch_model.bin"))
    monkeypatch.setenv("HF_HOME", str(tmp_path / "hf"))
    out1 = str(tmp_path / "f1.npz")
    main(["extract-features", "--config", str(cfg_path), "--synthetic",
          "--output", out1])
    assert "loaded pretrained backbone" in capsys.readouterr().out

    f0 = np.load(out0)["features"]
    f1 = np.load(out1)["features"]
    assert f0.shape == f1.shape
    assert np.abs(f0 - f1).max() > 1e-4


def test_vit_b16_patch_embed_discovery(tmp_path, monkeypatch):
    """The scripts' feature source: a vit_b_16 checkpoint in the torch hub
    cache flows into the patch_embed extractor and matches a direct
    transplant of the same weights."""
    from nerf_fewshot_tpu.models.dino import build_feature_extractor
    from nerf_fewshot_tpu.models.vit import (
        ViTPatchEmbed,
        find_torchvision_vit_b16_weights,
        load_torchvision_patch_embed,
        preprocess_vit_b16_input,
    )
    import jax

    hub = tmp_path / "torch" / "hub" / "checkpoints"
    hub.mkdir(parents=True)
    w = RNG.standard_normal((768, 3, 16, 16)).astype(np.float32) * 0.02
    b = RNG.standard_normal(768).astype(np.float32) * 0.01
    torch.save({"conv_proj.weight": torch.from_numpy(w),
                "conv_proj.bias": torch.from_numpy(b)},
               str(hub / "vit_b_16-c867db91.pth"))
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch"))
    monkeypatch.delenv("NERF_VIT_B16_WEIGHTS", raising=False)
    assert find_torchvision_vit_b16_weights() is not None

    cfg = config_from_dict({
        "model": {"use_dino": True, "dino_model_type": "patch_embed",
                  "dino_dim": 768},
    })
    apply, variables = build_feature_extractor(cfg.dino, image_size=64)
    img = RNG.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    got = np.asarray(apply(variables, img))

    # oracle: direct transplant through the (already torch-oracle-tested)
    # mapper + the same preprocessing
    model = ViTPatchEmbed()
    params = model.init(jax.random.key(0), jnp.zeros((224, 224, 3)))["params"]
    params = load_torchvision_patch_embed(
        params, {"conv_proj.weight": w, "conv_proj.bias": b}
    )
    want = np.asarray(model.apply(
        {"params": params}, jnp.asarray(preprocess_vit_b16_input(img))
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
