"""Torch-checkpoint round trip through the FULL CLI path: a reference-format
``.pth`` file (train.py:374-389 schema) written by torch is loaded by
``cli evaluate --checkpoint ckpt.pth`` and drives the complete analysis
harness; the imported params are bit-identical to the direct state_dict
import (whose render/grad parity test_full_parity pins)."""

import json
import os

import numpy as np
import pytest
import torch
import jax

from nerf_fewshot_tpu.training.config import load_config
from nerf_fewshot_tpu.training.trainer import Trainer
from nerf_fewshot_tpu.utils.torch_import import import_nerf_mlp_state_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(REPO, "experiments", "smoke.yaml")


def _torch_smoke_model(cfg):
    """torch modules matching the smoke config's NeRFMLP (reference naming:
    layers.{i} trunk + sigma_out/rgb_out heads, nerf_model.py:5-24)."""
    torch.manual_seed(7)
    pos_dim = 3 * (2 * cfg.nerf.pos_freq + 1)
    dir_dim = 3 * (2 * cfg.nerf.dir_freq + 1) if cfg.nerf.use_viewdirs else 0
    in_dim = pos_dim + dir_dim
    H = cfg.nerf.hidden_dim
    layers = torch.nn.ModuleList(
        [torch.nn.Linear(in_dim if i == 0 else H, H)
         for i in range(cfg.nerf.num_layers)]
    )
    model = torch.nn.Module()
    model.layers = layers
    model.sigma_out = torch.nn.Linear(H, 1)
    model.rgb_out = torch.nn.Linear(H, 3)
    return model


@pytest.fixture()
def torch_ckpt(tmp_path):
    cfg = load_config(SMOKE)
    model = _torch_smoke_model(cfg)
    path = str(tmp_path / "reference_epoch_5.pth")
    torch.save(
        {
            "epoch": 5,
            "best_psnr": 11.0,
            "nerf_model_state_dict": model.state_dict(),
            "config": {"experiment": {"name": "smoke"}},
        },
        path,
    )
    return cfg, model, path


def test_load_torch_matches_direct_import(tmp_path, torch_ckpt):
    cfg, model, path = torch_ckpt
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset

    scene = lego_like_scene()
    data = make_scene_dataset(scene, n_views=2, img_size=16, gt_samples=32)
    tr = Trainer(cfg, data)
    tr.load(path)  # .pth suffix routes through load_torch
    assert tr.epoch == 6  # resumes AFTER the checkpointed epoch

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    tr2 = Trainer(cfg, data)
    want = import_nerf_mlp_state_dict(tr2.params, sd)
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the imported params actually render
    rgb, depth, acc = tr.render_view(data.poses[0])
    assert np.isfinite(rgb).all() and rgb.shape == (data.H, data.W, 3)


def test_cli_evaluate_on_torch_checkpoint(tmp_path, torch_ckpt, monkeypatch):
    _, _, path = torch_ckpt
    from nerf_fewshot_tpu.cli import main

    out_dir = str(tmp_path / "analysis")
    monkeypatch.chdir(REPO)
    main([
        "evaluate", "--config", SMOKE, "--checkpoint", path,
        "--synthetic", "--output", out_dir, "--n-orbit", "1",
    ])
    with open(os.path.join(out_dir, "evaluation.json")) as f:
        results = json.load(f)
    assert {"psnr", "ssim", "lpips"} <= set(results["metrics"])
    assert os.path.exists(os.path.join(out_dir, "novel_00.png"))
