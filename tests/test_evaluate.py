"""Analysis-harness tests: the dependency-free plot rasterizer and the full
comprehensive_evaluation artifact set (the working analog of the reference's
truncated evaluate.py:272-304, incl. its heatmap/depth/histogram PNGs)."""

import json
import os

import numpy as np
import pytest

from nerf_fewshot_tpu.utils.plots import (
    apply_colormap,
    save_colormapped,
    save_heatmap,
    save_histogram,
)

RNG = np.random.default_rng(9)


def test_colormap_monotone_and_bounded():
    v = np.linspace(0, 1, 64)
    rgb = apply_colormap(v, "viridis")
    assert rgb.shape == (64, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # perceptual maps are monotone in luma-ish (R+G+B grows with value)
    luma = rgb.sum(-1)
    assert luma[-1] > luma[0]
    # constant input doesn't divide by zero
    flat = apply_colormap(np.ones(5), "plasma")
    assert np.isfinite(flat).all()


def test_plot_files_written(tmp_path):
    from PIL import Image

    hm = str(tmp_path / "hm.png")
    save_heatmap(hm, RNG.uniform(0, 1, (4, 4)))
    w, h = Image.open(hm).size
    assert (w, h) == (4 * 48, 4 * 48)

    cm = str(tmp_path / "depth.png")
    save_colormapped(cm, RNG.uniform(2, 6, (16, 16)), scale=2)
    assert Image.open(cm).size == (32, 32)

    hist = str(tmp_path / "hist.png")
    save_histogram(hist, RNG.standard_normal(1000), bins=50)
    img = np.asarray(Image.open(hist))
    assert img.shape[:2] == (240, 400)
    # bars drawn: some non-white pixels above the baseline
    assert (img[:-1] < 250).any()


@pytest.fixture(scope="module")
def dino_trainer(tmp_path_factory):
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.models.dino import build_feature_extractor
    from nerf_fewshot_tpu.training.config import config_from_dict
    from nerf_fewshot_tpu.training.trainer import Trainer

    tmp = tmp_path_factory.mktemp("eval")
    res = 16
    cfg = config_from_dict({
        "experiment": {"name": "eval-harness"},
        "data": {"resolution": res, "num_views": 3, "near": 2.0, "far": 6.0},
        "model": {"use_dino": True, "dino_model_type": "patch_embed",
                  "dino_dim": 768},
        "nerf_model": {"pos_freq": 4, "dir_freq": 2, "hidden_dim": 32,
                       "num_layers": 2, "use_viewdirs": False,
                       "sigma_bias": 0.1},
        "training": {
            "epochs": 1,
            "phases": [{"start": 0, "H": res, "n_samples": 8,
                        "batch_size": "full"}],
        },
        "rendering": {"chunk_size": 128, "white_bkgd": True},
        "output": {"save_dir": str(tmp), "val_freq": 1000, "save_freq": 1000},
    })
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=3, img_size=res, gt_samples=32)
    test = make_scene_dataset(scene, n_views=2, img_size=res, split="test",
                              gt_samples=32)
    ext, variables = build_feature_extractor(cfg.dino, res)
    feats = np.stack([
        np.asarray(ext(variables, train.white_composited()[v]))
        for v in range(3)
    ])
    tr = Trainer(cfg, train, test, dino_features=feats)
    tr.train_epoch(0)
    return tr


def test_comprehensive_evaluation_artifacts(dino_trainer, tmp_path):
    from nerf_fewshot_tpu.training.evaluate import comprehensive_evaluation

    out = str(tmp_path / "analysis")
    results = comprehensive_evaluation(dino_trainer, out, n_orbit=2)

    assert os.path.exists(os.path.join(out, "evaluation.json"))
    assert os.path.exists(os.path.join(out, "consistency_matrix.png"))
    assert os.path.exists(os.path.join(out, "depth_view_0.png"))
    assert os.path.exists(os.path.join(out, "depth_hist_view_0.png"))
    assert os.path.exists(os.path.join(out, "novel_00.png"))

    assert results["feature_3d_consistency"]["available"]
    V = dino_trainer.n_views
    mat = np.asarray(results["feature_3d_consistency"]["matrix"])
    assert mat.shape == (V, V)
    np.testing.assert_allclose(np.diag(mat), 1.0, atol=1e-5)

    raw = results["raw_feature_smoothness"]
    assert raw["available"]
    assert "view_0" in raw and raw["view_0"]["n_valid_points"] >= 0
    # metric triple present (LPIPS always computes now)
    assert {"psnr", "ssim", "lpips"} <= set(results["metrics"])

    with open(os.path.join(out, "evaluation.json")) as f:
        on_disk = json.load(f)
    assert "raw_feature_smoothness" in on_disk
