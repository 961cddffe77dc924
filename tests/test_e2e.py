"""End-to-end tests: few-shot training on a procedural synthetic scene
converges (the framework's equivalent of the reference's lego convergence),
Blender dataset IO round-trips, and trainer checkpoints resume."""

import os

import numpy as np
import pytest
import jax

from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
from nerf_fewshot_tpu.data.blender import load_blender, save_blender
from nerf_fewshot_tpu.training.config import config_from_dict
from nerf_fewshot_tpu.training.trainer import Trainer


def small_config(tmpdir, epochs=12, res=24, **overrides):
    d = {
        "experiment": {"name": "e2e"},
        "data": {"resolution": res, "num_views": 3, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 8, "dir_freq": 2, "hidden_dim": 64,
                       "num_layers": 3, "sigma_bias": 0.1},
        "training": {
            "epochs": epochs,
            "batch_size": 288,
            "progressive_schedule": {
                "epochs_0_50": [res, res, 24],
                "epochs_50_100": [res, res, 24],
                "epochs_100_plus": [res, res, 24],
            },
        },
        "optimizer": {"lr": 5e-3, "weight_decay": 1e-6,
                      "lr_milestones": [1000], "lr_gamma": 0.5},
        "rendering": {"chunk_size": 576, "white_bkgd": True},
        "output": {"save_dir": str(tmpdir), "val_freq": 1000,
                   "save_freq": 1000},
    }
    d.update(overrides)
    return config_from_dict(d)


@pytest.fixture(scope="module")
def scene_data():
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=3, img_size=24, gt_samples=96)
    test = make_scene_dataset(scene, n_views=1, img_size=24, gt_samples=96,
                              split="test")
    return train, test


def test_few_shot_training_converges(scene_data, tmp_path):
    train, test = scene_data
    cfg = small_config(tmp_path)
    tr = Trainer(cfg, train, test)
    m0 = tr.evaluate(max_views=1)
    for e in range(12):
        loss = tr.train_epoch(e)
    m1 = tr.evaluate(max_views=1)
    assert np.isfinite(loss)
    assert m1["psnr"] > m0["psnr"] + 2.0, (m0, m1)


def test_trainer_checkpoint_resume(scene_data, tmp_path):
    train, test = scene_data
    cfg = small_config(tmp_path, epochs=2)
    tr = Trainer(cfg, train, test)
    tr.train_epoch(0)
    tr.epoch = 0
    path = str(tmp_path / "resume.ckpt")
    tr.save(path)

    tr2 = Trainer(cfg, train, test)
    tr2.load(path)
    assert tr2.epoch == 1
    a = jax.tree_util.tree_leaves(tr.params)[0]
    b = jax.tree_util.tree_leaves(tr2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_dead_sigma_detector(scene_data, tmp_path):
    """The runtime dead-sigma detector (VERDICT r4 item 4b): a sigma head
    biased far negative puts the model in the exactly-zero-gradient
    collapse basin (alpha == 0 everywhere; reference shares the hazard via
    relu-sigma compositing, volume_renderer.py:32-38); the probe must
    report 0.0 there, the fit loop must count + JSONL-flag it, and a live
    start (sigma_bias 0.1) must read healthy."""
    import json

    train, test = scene_data

    # dead start: large negative constant sigma bias
    cfg = small_config(
        tmp_path, epochs=1,
        nerf_model={"pos_freq": 8, "dir_freq": 2, "hidden_dim": 64,
                    "num_layers": 3, "sigma_bias": -10.0},
    )
    log = tmp_path / "dead.jsonl"
    tr = Trainer(cfg, train, test, log_path=str(log))
    assert tr.dead_sigma_probe() == 0.0
    tr.fit()
    assert tr.dead_sigma_epochs == 1
    flagged = [
        json.loads(line) for line in open(log) if "dead_sigma" in line
    ]
    assert flagged and flagged[0]["dead_sigma"] is True

    # live start reads healthy and the counter resets through fit
    cfg2 = small_config(tmp_path, epochs=1)
    tr2 = Trainer(cfg2, train, test)
    assert tr2.dead_sigma_probe() > 0.0
    tr2.fit()
    assert tr2.dead_sigma_epochs == 0


def test_dino_conditioned_training_runs(scene_data, tmp_path):
    """Frozen-feature conditioning path: precomputed per-view maps are
    projected + bilinearly sampled per point and concatenated into the MLP
    input (the reference's single_scale pipeline shape)."""
    train, test = scene_data
    cfg = small_config(
        tmp_path, epochs=2,
        model={"use_dino": True, "dino_model_type": "single_scale"},
        dino_model={"name": "x", "use_lora": False, "lora_rank": 4,
                    "lora_alpha": 4},
    )
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((3, 9, 9, cfg.dino.output_dim)).astype(np.float32)
    tr = Trainer(cfg, train, test, dino_features=feats)
    loss0 = tr.train_epoch(0)
    loss1 = tr.train_epoch(1)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    m = tr.evaluate(max_views=1)
    assert np.isfinite(m["psnr"])


def test_hierarchical_training_converges(scene_data, tmp_path):
    """First-class coarse+fine importance sampling (the reference implements
    the sampler but never wires it in — SURVEY.md §0.3): training with
    rendering.n_importance > 0 runs end-to-end and improves eval PSNR."""
    train, test = scene_data
    cfg = small_config(
        tmp_path, epochs=12,
        rendering={"chunk_size": 576, "white_bkgd": True, "n_importance": 24},
    )
    tr = Trainer(cfg, train, test)
    m0 = tr.evaluate(max_views=1)
    for e in range(12):
        loss = tr.train_epoch(e)
    m1 = tr.evaluate(max_views=1)
    assert np.isfinite(loss)
    assert m1["psnr"] > m0["psnr"] + 2.0, (m0, m1)


def test_blender_io_roundtrip(scene_data, tmp_path):
    train, _ = scene_data
    base = str(tmp_path / "scene")
    os.makedirs(base, exist_ok=True)
    save_blender(base, "train", train.images, train.poses, camera_angle_x=0.6911)
    loaded = load_blender(base, "train")
    assert loaded.n_views == train.n_views
    assert loaded.H == train.H and loaded.W == train.W
    # 8-bit quantization error only
    np.testing.assert_allclose(loaded.images[..., :3], train.images,
                               atol=1.0 / 255 + 1e-6)
    np.testing.assert_allclose(loaded.poses, train.poses, rtol=1e-5)
    assert loaded.focal == pytest.approx(train.focal, rel=1e-3)


def test_blender_focal_reference_quirk(scene_data, tmp_path):
    """img_size-resized loads must reproduce the reference's double-applied
    focal scale (data_loader.py:62) under the default convention."""
    train, _ = scene_data
    base = str(tmp_path / "scene2")
    os.makedirs(base, exist_ok=True)
    save_blender(base, "train", train.images, train.poses, camera_angle_x=0.6911)
    half = train.H // 2
    ref = load_blender(base, "train", img_size=half)
    phys = load_blender(base, "train", img_size=half,
                        focal_convention="physical")
    scale = half / train.W
    assert ref.focal == pytest.approx(phys.focal * scale, rel=1e-5)


def test_fused_eval_matches_xla_eval(scene_data, tmp_path, monkeypatch):
    """Eval rendering through the forward-only inline-PE kernel (interpret
    mode via the test hook) must agree with the XLA-backend eval on the
    same fresh params."""
    import nerf_fewshot_tpu.training.trainer as trainer_mod

    train, test = scene_data
    nerf = {"pos_freq": 8, "dir_freq": 2, "hidden_dim": 128,
            "num_layers": 2, "sigma_bias": 0.1}
    monkeypatch.setattr(trainer_mod, "FORCE_INTERPRET_KERNELS", True)

    cfg_fused = small_config(tmp_path, epochs=1, nerf_model=dict(nerf))
    tr_fused = Trainer(cfg_fused, train, test)
    assert tr_fused._use_fused(), "hook should make the fused backend eligible"
    m_fused = tr_fused.evaluate(max_views=1)

    cfg_xla = small_config(
        tmp_path, epochs=1, nerf_model=dict(nerf),
        rendering={"chunk_size": 576, "white_bkgd": True, "backend": "xla"},
    )
    tr_xla = Trainer(cfg_xla, train, test)
    m_xla = tr_xla.evaluate(max_views=1)
    assert abs(m_fused["psnr"] - m_xla["psnr"]) < 1e-2, (m_fused, m_xla)
    assert abs(m_fused["ssim"] - m_xla["ssim"]) < 1e-3, (m_fused, m_xla)


def test_render_views_matches_render_view(scene_data, tmp_path):
    """Batched multi-pose serving render (round 5): render_views must equal
    stacking per-view render_view outputs exactly (same compiled chunk fn,
    same chunking math), across a chunk boundary that does not divide a
    single view's rays evenly."""
    train, test = scene_data
    cfg = small_config(tmp_path, epochs=1)
    tr = Trainer(cfg, train, test)
    tr.train_epoch(0)

    poses = [train.poses[0], train.poses[1], train.poses[2]]
    batched_rgb, batched_depth, batched_acc = tr.render_views(poses)
    for i, pose in enumerate(poses):
        rgb, depth, acc = tr.render_view(pose)
        np.testing.assert_array_equal(batched_rgb[i], rgb)
        np.testing.assert_array_equal(batched_depth[i], depth)
        np.testing.assert_array_equal(batched_acc[i], acc)
