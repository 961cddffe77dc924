"""Kernel-eligibility hardening: skip-connection configs must never reach
the fused kernels — 'fused' raises with the reason, 'auto' falls back to
XLA — and pack_params rejects non-uniform trunks outright."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.render.kernels import pack_params
from nerf_fewshot_tpu.training.config import config_from_dict
import nerf_fewshot_tpu.training.trainer as trainer_mod


def _cfg(backend, skip_layers, tmp_path):
    return config_from_dict({
        "experiment": {"name": "elig"},
        "data": {"resolution": 16, "num_views": 2, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 6, "dir_freq": 2, "hidden_dim": 128,
                       "num_layers": 3, "skip_layers": skip_layers},
        "training": {
            "epochs": 1, "batch_size": 128,
            "progressive_schedule": {
                "epochs_0_50": [16, 16, 8],
                "epochs_50_100": [16, 16, 8],
                "epochs_100_plus": [16, 16, 8],
            },
        },
        "rendering": {"backend": backend, "chunk_size": 256},
        "output": {"save_dir": str(tmp_path), "val_freq": 1000,
                   "save_freq": 1000},
    })


def _trainer(cfg):
    scene = lego_like_scene()
    data = make_scene_dataset(scene, n_views=2, img_size=16, gt_samples=32)
    return trainer_mod.Trainer(cfg, data)


def test_fused_backend_rejects_skip_layers(tmp_path, monkeypatch):
    monkeypatch.setattr(trainer_mod, "FORCE_INTERPRET_KERNELS", True)
    tr = _trainer(_cfg("fused", [1], tmp_path))
    with pytest.raises(ValueError, match="skip_layers"):
        tr.train_epoch(0)


def test_auto_backend_falls_back_on_skip_layers(tmp_path, monkeypatch):
    monkeypatch.setattr(trainer_mod, "FORCE_INTERPRET_KERNELS", True)
    tr = _trainer(_cfg("auto", [1], tmp_path))
    assert not tr._kernel_eligible()
    loss = tr.train_epoch(0)  # XLA path handles skips fine
    assert np.isfinite(loss)


def test_pack_params_rejects_skip_trunk():
    model = NeRFMLP(pos_freq=6, dir_freq=2, use_viewdirs=True,
                    hidden_dim=128, num_layers=3, skip_layers=(1,))
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    with pytest.raises(ValueError, match="uniform"):
        pack_params(params, num_layers=3, hidden_dim=128)
