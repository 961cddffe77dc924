"""Training-layer tests: config parsing of the reference YAMLs, optimizer
parity with torch Adam/AdamW + MultiStepLR, loss masking, metrics, checkpoint
round-trip, and end-to-end few-shot convergence on a synthetic scene."""

import dataclasses
import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import optax

from nerf_fewshot_tpu.training.config import (
    Config,
    PhaseSpec,
    config_from_dict,
    load_config,
)
from nerf_fewshot_tpu.training.losses import nerf_loss
from nerf_fewshot_tpu.training.config import LossConfig
from nerf_fewshot_tpu.training.metrics import psnr, ssim
from nerf_fewshot_tpu.training.optim import (
    make_optimizer,
    multistep_lr,
    set_learning_rate,
)
from nerf_fewshot_tpu.training.config import OptimizerConfig
from nerf_fewshot_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

REF_EXPERIMENTS = os.path.join(
    os.environ.get("NERF_REFERENCE_PATH", "/root/reference"), "experiments"
)
RNG = np.random.default_rng(7)


# ------------------------------------------------------------------- config


@pytest.mark.parametrize(
    "name", ["baseline", "dino_nerf", "lora", "multiscale", "projection"]
)
def test_reference_yaml_configs_load(name):
    path = os.path.join(REF_EXPERIMENTS, f"{name}.yaml")
    if not os.path.exists(path):
        pytest.skip("reference experiments not mounted")
    cfg = load_config(path)
    assert cfg.epochs == 200
    assert cfg.data.near == 2.0 and cfg.data.far == 6.0
    assert cfg.rendering.near == 2.0 and cfg.rendering.far == 6.0
    assert cfg.nerf.hidden_dim == 256 and cfg.nerf.num_layers == 8
    assert len(cfg.phases) == 3
    # reference batch multipliers ×2 / ×1 / ÷2 (train.py:249-258)
    assert cfg.phases[0].batch_size == cfg.batch_size * 2
    assert cfg.phases[2].batch_size == cfg.batch_size // 2
    if name == "baseline":
        assert not cfg.dino.use_dino
        assert cfg.nerf.pos_freq == 10
    else:
        assert cfg.dino.use_dino
        assert cfg.nerf.pos_freq == 12
    if name == "multiscale":
        assert cfg.dino.model_type == "multi_scale"
        assert cfg.dino.output_dim == 128
    if name == "projection":
        # divergent schema: optimizer fields under `training`
        assert cfg.optimizer.lr == pytest.approx(2e-4)
        assert cfg.loss.depth_weight == pytest.approx(0.1)


def test_all_repo_experiment_configs_load():
    """Every config shipped in experiments/ must load into a valid tree."""
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "experiments", "*.yaml")))
    assert len(paths) >= 12
    for path in paths:
        cfg = load_config(path)
        assert cfg.phases and cfg.epochs > 0
        for ph in cfg.phases:
            assert ph.batch_size > 0 and ph.n_samples > 0


def test_phase_lookup():
    cfg = config_from_dict({"training": {"batch_size": 100}})
    assert cfg.phase_for_epoch(0).H == 32
    assert cfg.phase_for_epoch(49).batch_size == 200
    assert cfg.phase_for_epoch(50).H == 64
    assert cfg.phase_for_epoch(150).H == 128
    assert cfg.phase_for_epoch(150).batch_size == 50


# ---------------------------------------------------------------- optimizer


def _run_optax(tx, params, grads_seq, lrs=None):
    state = tx.init(params)
    for i, g in enumerate(grads_seq):
        if lrs is not None:
            set_learning_rate(state, lrs[i])
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params


def test_adam_matches_torch_adam_with_weight_decay():
    """torch Adam applies wd as additive L2 on the grad pre-moments —
    different from AdamW; check our chain against torch step-for-step."""
    w0 = RNG.standard_normal((6, 4)).astype(np.float32)
    grads_seq = [RNG.standard_normal((6, 4)).astype(np.float32) for _ in range(5)]
    wd, lr = 0.1, 1e-2

    tw = torch.from_numpy(w0.copy()).requires_grad_(True)
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = OptimizerConfig(lr=lr, weight_decay=wd, lr_milestones=(), kind="adam")
    params = {"w": jnp.asarray(w0)}
    got = _run_optax(
        make_optimizer(cfg, params), params, [{"w": jnp.asarray(g)} for g in grads_seq]
    )
    np.testing.assert_allclose(
        np.asarray(got["w"]), tw.detach().numpy(), rtol=1e-4, atol=1e-6
    )


def test_adamw_matches_torch_adamw():
    w0 = RNG.standard_normal((5, 3)).astype(np.float32)
    grads_seq = [RNG.standard_normal((5, 3)).astype(np.float32) for _ in range(4)]
    wd, lr = 0.05, 2e-3

    tw = torch.from_numpy(w0.copy()).requires_grad_(True)
    opt = torch.optim.AdamW([tw], lr=lr, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = OptimizerConfig(lr=lr, weight_decay=wd, lr_milestones=(), kind="adamw")
    params = {"w": jnp.asarray(w0)}
    got = _run_optax(
        make_optimizer(cfg, params), params, [{"w": jnp.asarray(g)} for g in grads_seq]
    )
    np.testing.assert_allclose(
        np.asarray(got["w"]), tw.detach().numpy(), rtol=1e-4, atol=1e-6
    )


def test_multistep_lr_matches_torch():
    base, gamma, milestones = 5e-4, 0.5, [100, 150]
    w = torch.zeros(1, requires_grad=True)
    opt = torch.optim.Adam([w], lr=base)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones, gamma=gamma)
    lr_fn = multistep_lr(base, milestones, gamma)
    for epoch in range(200):
        # torch scheduler's get_last_lr *before* step == lr used at `epoch`
        assert lr_fn(epoch) == pytest.approx(sched.get_last_lr()[0])
        sched.step()


def test_set_learning_rate_changes_updates():
    cfg = OptimizerConfig(lr=1.0, weight_decay=0.0, lr_milestones=(), kind="adam")
    params = {"w": jnp.ones((3,))}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    set_learning_rate(state, 0.0)
    updates, _ = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0, atol=1e-9)


def test_lora_only_mask_freezes_base():
    cfg = OptimizerConfig(lr=1e-2, weight_decay=0.0, lr_milestones=(), kind="adam")
    params = {"trunk": {"kernel": jnp.ones((2, 2))}, "lora_a": jnp.ones((2, 1))}
    tx = make_optimizer(cfg, params, lora_only=True)
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(updates["trunk"]["kernel"]), 0.0)
    assert float(jnp.abs(updates["lora_a"]).sum()) > 0


# -------------------------------------------------------------------- losses


def test_masked_loss_equals_unpadded():
    pred = jnp.asarray(RNG.uniform(0, 1, (10, 3)).astype(np.float32))
    tgt = jnp.asarray(RNG.uniform(0, 1, (10, 3)).astype(np.float32))
    full = nerf_loss(pred, tgt, LossConfig())["total"]

    pad_pred = jnp.concatenate([pred, jnp.zeros((6, 3))])
    pad_tgt = jnp.concatenate([tgt, jnp.ones((6, 3))])
    mask = jnp.concatenate([jnp.ones(10), jnp.zeros(6)])
    padded = nerf_loss(pad_pred, pad_tgt, LossConfig(), mask=mask)["total"]
    np.testing.assert_allclose(float(full), float(padded), rtol=1e-6)


def test_loss_weights_combine():
    pred = jnp.ones((4, 3)) * 0.5
    tgt = jnp.zeros((4, 3))
    w = jnp.ones((4, 8)) * 0.1
    cfg = LossConfig(rgb_weight=2.0, reg_weight=0.5)
    out = nerf_loss(pred, tgt, cfg, weights=w)
    assert out["total"] == pytest.approx(2.0 * 0.25 + 0.5 * 0.01, rel=1e-5)


# ------------------------------------------------------------------- metrics


def test_psnr_basic():
    a = jnp.zeros((8, 8, 3))
    b = jnp.ones((8, 8, 3)) * 0.1
    # mse = 0.01 → psnr = 20
    assert float(psnr(b, a)) == pytest.approx(20.0, abs=1e-3)


def test_ssim_identity_and_range():
    img = jnp.asarray(RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noisy = jnp.clip(img + 0.5 * RNG.standard_normal((32, 32, 3)).astype(np.float32), 0, 1)
    s = float(ssim(img, noisy))
    assert 0.0 < s < 0.9


def test_ssim_matches_skimage_formula():
    """Cross-check against an independent scipy-free torch implementation of
    gaussian-window SSIM (same constants torchmetrics uses)."""
    img1 = RNG.uniform(0, 1, (24, 24, 1)).astype(np.float32)
    img2 = np.clip(img1 + 0.1 * RNG.standard_normal((24, 24, 1)).astype(np.float32), 0, 1)

    x = torch.arange(11, dtype=torch.float32) - 5
    g = torch.exp(-(x**2) / (2 * 1.5**2))
    g = (g / g.sum()).outer(g / g.sum())
    k = g[None, None]

    def f(t):
        return torch.nn.functional.conv2d(t[None, None], k).squeeze()

    t1, t2 = torch.from_numpy(img1[..., 0]), torch.from_numpy(img2[..., 0])
    mu1, mu2 = f(t1), f(t2)
    v1 = f(t1 * t1) - mu1**2
    v2 = f(t2 * t2) - mu2**2
    cov = f(t1 * t2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    want = (
        ((2 * mu1 * mu2 + c1) * (2 * cov + c2))
        / ((mu1**2 + mu2**2 + c1) * (v1 + v2 + c2))
    ).mean()
    got = ssim(jnp.asarray(img1), jnp.asarray(img2))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


# --------------------------------------------------------------- checkpoint


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"w": jnp.asarray(RNG.standard_normal((4, 4)).astype(np.float32))},
        "count": jnp.asarray(3),
    }
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, tree, metadata={"epoch": 7, "best_psnr": 1.5})
    target = {
        "params": {"w": jnp.zeros((4, 4))},
        "count": jnp.asarray(0),
    }
    restored, meta = restore_checkpoint(path, target)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.asarray(tree["params"]["w"])
    )
    assert int(restored["count"]) == 3
    assert meta["epoch"] == 7


# ----------------------------------------------------------- observability


def test_fit_logs_rays_per_sec(tmp_path):
    """fit() emits the headline throughput metric per epoch in the JSONL log
    (the wired utils.profiling.RateMeter)."""
    import json

    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    from nerf_fewshot_tpu.training.trainer import Trainer

    cfg = config_from_dict({
        "experiment": {"name": "rate-log"},
        "data": {"resolution": 16, "num_views": 2, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 4, "dir_freq": 2, "hidden_dim": 32,
                       "num_layers": 2, "sigma_bias": 0.1},
        "training": {"epochs": 2, "phases": [
            {"start": 0, "H": 16, "n_samples": 8, "batch_size": 128}]},
        "rendering": {"chunk_size": 128},
        "output": {"save_dir": str(tmp_path), "val_freq": 1000,
                   "save_freq": 1000},
    })
    scene = lego_like_scene()
    data = make_scene_dataset(scene, n_views=2, img_size=16, gt_samples=32)
    log = str(tmp_path / "log.jsonl")
    tr = Trainer(cfg, data, log_path=log)
    tr.fit(2)
    rows = [json.loads(line) for line in open(log)]
    rates = [r["rays_per_sec"] for r in rows if "rays_per_sec" in r]
    assert len(rates) == 2 and all(r > 0 for r in rates)


def test_config_validation_rejects_typos(tmp_path):
    import yaml as _yaml

    from nerf_fewshot_tpu.training.config import load_config as _lc

    bad = {"rendering": {"backend": "fussed"}}
    p = tmp_path / "bad.yaml"
    p.write_text(_yaml.safe_dump(bad))
    with pytest.raises(ValueError, match="rendering.backend"):
        _lc(str(p))
    bad2 = {"dino_model": {"invalid_fill": "means"}}
    p2 = tmp_path / "bad2.yaml"
    p2.write_text(_yaml.safe_dump(bad2))
    with pytest.raises(ValueError, match="invalid_fill"):
        _lc(str(p2))

def test_config_validation_rejects_malformed_phase_schedules():
    from nerf_fewshot_tpu.training.config import config_from_dict as _cfd

    def phases(spans):
        return {"training": {"phases": [
            {"start": s, "end": e, "resolution": 16,
             "n_samples": 32} for s, e in spans
        ]}}

    # late start: early epochs would silently train at the LAST phase's shape
    with pytest.raises(ValueError, match="start at 0"):
        _cfd(phases([(1, 10), (10, 20)]))
    # gap between phases
    with pytest.raises(ValueError, match="not contiguous"):
        _cfd(phases([(0, 10), (12, 20)]))
    # overlap is also non-contiguous
    with pytest.raises(ValueError, match="not contiguous"):
        _cfd(phases([(0, 10), (8, 20)]))
    # empty phase
    with pytest.raises(ValueError, match="empty"):
        _cfd(phases([(0, 0)]))
    # a well-formed schedule passes
    cfg = _cfd(phases([(0, 10), (10, 20)]))
    assert len(cfg.phases) == 2
