"""Module-stack (NeRFWithDINO / multi-scale) trainer path: the reference's
train_multiscale.py pipeline shape — fusion-conditioned NeRF with AdamW,
grad clipping, aux losses."""

import numpy as np
import pytest
import jax

from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
from nerf_fewshot_tpu.training.config import config_from_dict
from nerf_fewshot_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def data():
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=2, img_size=16, gt_samples=64)
    test = make_scene_dataset(scene, n_views=1, img_size=16, gt_samples=64,
                              split="test")
    return train, test


def test_module_arch_trains(data, tmp_path):
    train, test = data
    cfg = config_from_dict({
        "experiment": {"name": "module-arch"},
        "data": {"resolution": 16, "num_views": 2, "near": 2.0, "far": 6.0},
        "model": {"use_dino": True, "dino_model_type": "multi_scale"},
        "nerf_model": {"pos_freq": 4, "dir_freq": 2, "hidden_dim": 32,
                       "num_layers": 2},
        "dino_model": {"name": "x", "use_lora": True, "lora_rank": 4,
                       "lora_alpha": 4},
        "training": {"epochs": 2, "batch_size": 128,
                     "progressive_schedule": {
                         "epochs_0_50": [16, 16, 8],
                         "epochs_50_100": [16, 16, 8],
                         "epochs_100_plus": [16, 16, 8]}},
        "optimizer": {"lr": 1e-3, "weight_decay": 1e-6,
                      "lr_milestones": [100], "lr_gamma": 0.5},
        "loss": {"rgb_weight": 1.0, "depth_weight": 0.1, "reg_weight": 1e-4},
        "rendering": {"chunk_size": 128, "white_bkgd": True},
        "output": {"save_dir": str(tmp_path), "val_freq": 100,
                   "save_freq": 100},
        "strict_reference_behavior": False,
    })
    # module arch uses the fusion stack
    import dataclasses
    cfg = dataclasses.replace(
        cfg, nerf=dataclasses.replace(cfg.nerf, arch="module")
    )
    assert cfg.dino.output_dim == 128
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 4, 4, 128)).astype(np.float32)
    tr = Trainer(cfg, train, test, dino_features=feats)
    l0 = tr.train_epoch(0)
    l1 = tr.train_epoch(1)
    assert np.isfinite(l0) and np.isfinite(l1)
    m = tr.evaluate(max_views=1)
    assert np.isfinite(m["psnr"])


def test_lora_two_phase_freeze(data, tmp_path):
    """Two-phase training (train_lora.py:89-93): after the boundary epoch
    only LoRA params change."""
    train, test = data
    cfg = config_from_dict({
        "experiment": {"name": "two-phase"},
        "data": {"resolution": 16, "num_views": 2, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 4, "dir_freq": 2, "hidden_dim": 32,
                       "num_layers": 2},
        "training": {"epochs": 3, "batch_size": 128,
                     "progressive_schedule": {
                         "epochs_0_50": [16, 16, 8],
                         "epochs_50_100": [16, 16, 8],
                         "epochs_100_plus": [16, 16, 8]}},
        "optimizer": {"lr": 1e-3, "weight_decay": 0.0,
                      "lr_milestones": [100], "lr_gamma": 0.5},
        "rendering": {"chunk_size": 128, "white_bkgd": True},
        "output": {"save_dir": str(tmp_path), "val_freq": 100,
                   "save_freq": 100},
    })
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        nerf=dataclasses.replace(cfg.nerf, lora_rank=2),
        optimizer=dataclasses.replace(cfg.optimizer, lora_only_after_epoch=1),
    )
    tr = Trainer(cfg, train, test)
    tr.train_epoch(0)
    base_before = np.asarray(tr.params["trunk_0"]["base"]["kernel"]).copy()
    lora_before = np.asarray(tr.params["trunk_0"]["lora_b"]).copy()
    tr.train_epoch(1)  # freeze boundary
    base_after = np.asarray(tr.params["trunk_0"]["base"]["kernel"])
    lora_after = np.asarray(tr.params["trunk_0"]["lora_b"])
    np.testing.assert_array_equal(base_before, base_after)
    assert not np.allclose(lora_before, lora_after)
