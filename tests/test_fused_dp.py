"""Fused train kernel under shard_map DP (8 virtual CPU devices, interpret
mode): loss and gradients must equal the single-device kernel."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.parallel import make_mesh
from nerf_fewshot_tpu.parallel.fused_dp import make_dp_fused_loss_grad
from nerf_fewshot_tpu.render.pipeline import RenderSettings
from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

RNG = np.random.default_rng(41)
R, S, HIDDEN, NL = 64, 8, 128, 2
POS_FREQ, DIR_FREQ = 6, 2


def test_dp_fused_matches_single_device():
    model = NeRFMLP(pos_freq=POS_FREQ, dir_freq=DIR_FREQ, use_viewdirs=True,
                    hidden_dim=HIDDEN, num_layers=NL)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    ro = jnp.asarray(RNG.standard_normal((R, 3)).astype(np.float32))
    rd = jnp.asarray(RNG.standard_normal((R, 3)).astype(np.float32))
    tgt = jnp.asarray(RNG.uniform(0, 1, (R, 3)).astype(np.float32))
    mask = jnp.asarray((RNG.uniform(0, 1, (R,)) > 0.2).astype(np.float32))
    # deterministic sampling (perturb off) so shards see identical z grids
    settings = RenderSettings(near=2.0, far=6.0, n_samples=S, perturb=False)

    want_loss, want_grads = fused_train_loss_grad(
        params, ro, rd, tgt, mask, settings, POS_FREQ, DIR_FREQ, NL, HIDDEN,
        interpret=True,
    )

    mesh = make_mesh(8)
    dp_fn = make_dp_fused_loss_grad(
        mesh, settings, POS_FREQ, DIR_FREQ, NL, HIDDEN, interpret=True
    )
    got_loss, got_grads = dp_fn(params, jax.random.key(1), ro, rd, tgt, mask)

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(want_grads),
                    jax.tree_util.tree_leaves(got_grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_dispatches_dp_kernel(tmp_path, monkeypatch):
    """Trainer + device mesh + kernel-eligible config must route the train
    step through the shard_map DP kernel (parallel/fused_dp), not XLA
    autodiff — and train sanely through it."""
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    import nerf_fewshot_tpu.training.trainer as trainer_mod
    import nerf_fewshot_tpu.parallel.fused_dp as fused_dp_mod

    res = 16
    cfg = config_from_dict({
        "experiment": {"name": "dp-kernel"},
        "data": {"resolution": res, "num_views": 2, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 6, "dir_freq": 2, "hidden_dim": 128,
                       "num_layers": 2, "sigma_bias": 0.1},
        "training": {
            "epochs": 2, "batch_size": 128,
            "progressive_schedule": {
                "epochs_0_50": [res, res, 16],
                "epochs_50_100": [res, res, 16],
                "epochs_100_plus": [res, res, 16],
            },
        },
        "optimizer": {"lr": 5e-3, "weight_decay": 1e-6,
                      "lr_milestones": [1000], "lr_gamma": 0.5},
        "rendering": {"chunk_size": 256, "white_bkgd": True},
        "output": {"save_dir": str(tmp_path), "val_freq": 1000,
                   "save_freq": 1000},
    })
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=2, img_size=res, gt_samples=64)

    calls = []
    orig = fused_dp_mod.make_dp_fused_loss_grad

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fused_dp_mod, "make_dp_fused_loss_grad", spy)
    monkeypatch.setattr(trainer_mod, "FORCE_INTERPRET_KERNELS", True)

    tr = trainer_mod.Trainer(cfg, train, mesh=make_mesh(8))
    l0 = tr.train_epoch(0)
    l1 = tr.train_epoch(1)
    assert calls, "DP train step did not dispatch the shard_map kernel"
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)

def test_dp_fused_with_point_features_matches_single_device():
    """DINO feature conditioning through the shard_map DP path (the reference
    hot loop train.py:210-221 under data parallelism): the feature map + pose
    enter as replicated operands, the sampler runs as an XLA prologue on each
    shard, and loss/grads must equal the single-device feature-conditioned
    kernel."""
    from nerf_fewshot_tpu.training.trainer import _feature_sampler

    dino_dim = 64
    model = NeRFMLP(pos_freq=POS_FREQ, dir_freq=DIR_FREQ, use_viewdirs=True,
                    hidden_dim=HIDDEN, num_layers=NL, dino_dim=dino_dim,
                    sigma_bias_init=0.3)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
        jnp.zeros((1, dino_dim)),
    )["params"]
    ro = jnp.asarray(RNG.standard_normal((R, 3)).astype(np.float32))
    rd = jnp.asarray(RNG.standard_normal((R, 3)).astype(np.float32))
    tgt = jnp.asarray(RNG.uniform(0, 1, (R, 3)).astype(np.float32))
    mask = jnp.asarray((RNG.uniform(0, 1, (R,)) > 0.2).astype(np.float32))
    settings = RenderSettings(near=2.0, far=6.0, n_samples=S, perturb=False)

    # a real per-view feature map + pose, sampled with the trainer's closure
    feat_map = jnp.asarray(
        RNG.standard_normal((14, 14, dino_dim)).astype(np.float32)
    )
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    feat_pose = jnp.asarray(pose)
    focal, H, W = 50.0, 64, 64

    def builder(fm, fp):
        return _feature_sampler(fm, fp, focal, H, W, align_corners=True)

    want_loss, want_grads = fused_train_loss_grad(
        params, ro, rd, tgt, mask, settings, POS_FREQ, DIR_FREQ, NL, HIDDEN,
        point_features_fn=builder(feat_map, feat_pose), interpret=True,
    )

    mesh = make_mesh(8)
    dp_fn = make_dp_fused_loss_grad(
        mesh, settings, POS_FREQ, DIR_FREQ, NL, HIDDEN, interpret=True,
        point_features_builder=builder,
    )
    got_loss, got_grads = dp_fn(
        params, jax.random.key(1), ro, rd, tgt, mask, feat_map, feat_pose
    )

    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(want_grads),
                    jax.tree_util.tree_leaves(got_grads)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_trainer_dispatches_dp_kernel_with_dino(tmp_path, monkeypatch):
    """A feature-conditioned (use_dino) config under a device mesh must now
    ride the shard_map DP kernel — round 2 silently fell back to XLA
    (trainer.py's old use_dino override) — and train sanely through it."""
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    import nerf_fewshot_tpu.training.trainer as trainer_mod
    import nerf_fewshot_tpu.parallel.fused_dp as fused_dp_mod

    res = 16
    cfg = config_from_dict({
        "experiment": {"name": "dp-kernel-dino"},
        "data": {"resolution": res, "num_views": 2, "near": 2.0, "far": 6.0},
        "model": {"use_dino": True, "dino_model_type": "single_scale",
                  "dino_dim": 64},
        "nerf_model": {"pos_freq": 6, "dir_freq": 2, "hidden_dim": 128,
                       "num_layers": 2, "sigma_bias": 0.1},
        "training": {
            "epochs": 2, "batch_size": 128,
            "progressive_schedule": {
                "epochs_0_50": [res, res, 16],
                "epochs_50_100": [res, res, 16],
                "epochs_100_plus": [res, res, 16],
            },
        },
        "optimizer": {"lr": 5e-3, "weight_decay": 1e-6,
                      "lr_milestones": [1000], "lr_gamma": 0.5},
        "rendering": {"chunk_size": 256, "white_bkgd": True},
        "output": {"save_dir": str(tmp_path), "val_freq": 1000,
                   "save_freq": 1000},
    })
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=2, img_size=res, gt_samples=64)
    feats = np.asarray(
        RNG.standard_normal((2, 14, 14, 64)), dtype=np.float32
    )

    builders = []
    orig = fused_dp_mod.make_dp_fused_loss_grad

    def spy(*a, **k):
        builders.append(k.get("point_features_builder"))
        return orig(*a, **k)

    monkeypatch.setattr(fused_dp_mod, "make_dp_fused_loss_grad", spy)
    monkeypatch.setattr(trainer_mod, "FORCE_INTERPRET_KERNELS", True)

    tr = trainer_mod.Trainer(cfg, train, mesh=make_mesh(8),
                             dino_features=feats)
    assert tr.use_dino
    l0 = tr.train_epoch(0)
    l1 = tr.train_epoch(1)
    assert builders, "DP train step did not dispatch the shard_map kernel"
    assert all(b is not None for b in builders), \
        "DP kernel was built WITHOUT the feature sampler"
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)


def test_trainer_dispatches_kernel_for_nonstrict_reg_objective(tmp_path, monkeypatch):
    """Round 5: the non-strict rgb + w²-reg objective is kernel-eligible —
    the Trainer must route it through the single-pass kernel with the
    config's reg_weight (previously it fell back to the ~2.5×-slower XLA
    path for any non-strict loss), and the epoch loss must include the reg
    term's contribution."""
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    import nerf_fewshot_tpu.training.trainer as trainer_mod
    import nerf_fewshot_tpu.render.train_kernel as tk_mod

    res = 16
    base = {
        "experiment": {"name": "reg-kernel"},
        "data": {"resolution": res, "num_views": 2, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 6, "dir_freq": 2, "hidden_dim": 128,
                       "num_layers": 2, "sigma_bias": 0.1},
        "training": {
            "epochs": 1, "batch_size": 128,
            "progressive_schedule": {
                "epochs_0_50": [res, res, 16],
                "epochs_50_100": [res, res, 16],
                "epochs_100_plus": [res, res, 16],
            },
        },
        "optimizer": {"lr": 5e-3, "weight_decay": 1e-6,
                      "lr_milestones": [1000], "lr_gamma": 0.5},
        "loss": {"rgb_weight": 1.0, "depth_weight": 0.0, "reg_weight": 0.05},
        "rendering": {"chunk_size": 256, "white_bkgd": True},
        "output": {"save_dir": str(tmp_path), "val_freq": 1000,
                   "save_freq": 1000},
        "strict_reference_behavior": False,
    }
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=2, img_size=res, gt_samples=64)

    seen_reg = []
    orig = tk_mod.fused_train_loss_grad

    def spy(*a, **k):
        seen_reg.append(k.get("reg_weight", 0.0))
        return orig(*a, **k)

    monkeypatch.setattr(tk_mod, "fused_train_loss_grad", spy)
    monkeypatch.setattr(trainer_mod, "FORCE_INTERPRET_KERNELS", True)

    tr = trainer_mod.Trainer(cfg := config_from_dict(base), train)
    loss_reg = tr.train_epoch(0)
    assert seen_reg and seen_reg[0] == 0.05, seen_reg
    assert np.isfinite(loss_reg)

    # strict mode keeps the pure-rgb objective (reg_weight 0 in-kernel)
    base2 = dict(base)
    base2["strict_reference_behavior"] = True
    seen_reg.clear()
    tr2 = trainer_mod.Trainer(config_from_dict(base2), train)
    loss_rgb = tr2.train_epoch(0)
    assert seen_reg and seen_reg[0] == 0.0, seen_reg
    # same init/seed: the reg objective's epoch loss carries the extra term
    assert loss_reg > loss_rgb
