"""Faithful standalone-script feature path (reference: train_baseline.py:
33-64, train_lora.py:48-80,118-129):

* ViT-B/16 patch-embedding-only extraction — torch conv oracle (the
  torchvision ``_process_input`` math: conv_proj stride-16 → reshape →
  permute → 14×14×768 grid).
* The preprocessing transform (ToPILImage uint8 truncation → PIL bilinear
  224×224 resize → Normalize(0.5, 0.5)).
* align_corners=True point sampling against torch grid_sample.
* The multiscale mean-fill quirk (train_multiscale.py:185-196) against a
  torch oracle with behind-camera points.
* Config plumbing for all of it.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models.vit import (
    ViTPatchEmbed,
    load_torchvision_patch_embed,
    preprocess_vit_b16_input,
)
from nerf_fewshot_tpu.ops.rays import project_points_to_image
from nerf_fewshot_tpu.training.config import config_from_dict, load_config
from nerf_fewshot_tpu.training.trainer import _feature_sampler

RNG = np.random.default_rng(7)


def _torch_process_input(img_chw: torch.Tensor, weight, bias, patch=16):
    """torchvision VisionTransformer._process_input equivalent: conv_proj →
    (1, hidden, 14, 14) → reshape (1, hidden, 196) → permute (1, 196, hidden)
    (reference consumes it as .view(1, 14, 14, 768), train_baseline.py:62-64).
    """
    x = F.conv2d(img_chw[None], weight, bias, stride=patch)
    n, c, h, w = x.shape
    x = x.reshape(n, c, h * w).permute(0, 2, 1)
    return x.reshape(n, h, w, c)[0]


def test_patch_embed_conv_matches_torch_oracle():
    model = ViTPatchEmbed()
    x = RNG.standard_normal((224, 224, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]

    # transplant torch-layout weights into the flax conv and compare
    w = RNG.standard_normal((768, 3, 16, 16)).astype(np.float32) * 0.02
    b = RNG.standard_normal(768).astype(np.float32) * 0.01
    params = load_torchvision_patch_embed(
        params, {"conv_proj.weight": w, "conv_proj.bias": b}
    )
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    want = _torch_process_input(
        torch.from_numpy(x).permute(2, 0, 1), torch.from_numpy(w),
        torch.from_numpy(b),
    ).numpy()
    assert got.shape == (14, 14, 768)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_preprocess_is_uint8_quantized_and_normalized():
    img = RNG.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    out = preprocess_vit_b16_input(img)
    assert out.shape == (224, 224, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # PIL's bilinear resize emits uint8 → every value sits on the 255-grid
    # after un-normalizing, reproducing ToPILImage/ToTensor quantization.
    grid = (out * 0.5 + 0.5) * 255.0
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-3)
    # identity-size path: quantization only (floor, the torch .byte() cast)
    out2 = preprocess_vit_b16_input(img, size=128)
    grid2 = (out2 * 0.5 + 0.5) * 255.0
    np.testing.assert_allclose(grid2, np.floor(img * 255.0), atol=1e-3)


def test_align_corners_sampling_matches_torch_chain():
    """Projection + align_corners=True grid_sample — the standalone scripts'
    manual chain (train_lora.py:118-129) against torch on the same feature
    grid."""
    H = W = 128
    focal = 100.0
    feat = RNG.standard_normal((14, 14, 8)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    pts = RNG.uniform(-1.5, 1.5, (64, 3)).astype(np.float32)

    sampler = _feature_sampler(
        jnp.asarray(feat), jnp.asarray(pose), focal, H, W, align_corners=True
    )
    got = np.asarray(sampler(jnp.asarray(pts)))

    # torch oracle: the scripts' exact projection + grid_sample call
    tp = torch.from_numpy(pts)
    tpose = torch.from_numpy(pose)
    pts_cam = torch.matmul(tp - tpose[:3, 3], tpose[:3, :3].T)
    x = (pts_cam[:, 0] / (pts_cam[:, 2] + 1e-8)) * focal + W / 2
    y = (pts_cam[:, 1] / (pts_cam[:, 2] + 1e-8)) * focal + H / 2
    grid = torch.stack(((x / W) * 2 - 1, (y / H) * 2 - 1), dim=-1)
    gmap = torch.from_numpy(feat).permute(2, 0, 1)[None]
    want = F.grid_sample(
        gmap, grid.view(1, -1, 1, 2), align_corners=True, mode="bilinear"
    )[0, :, :, 0].T.numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mean_fill_matches_torch_oracle():
    """Invalid-projection mean-fill (train_multiscale.py:185-196): features
    of behind-camera/out-of-image points replaced by the mean over ALL
    sampled features (including the zero-filled invalid ones)."""
    H = W = 64
    focal = 50.0
    feat = RNG.standard_normal((16, 16, 4)).astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    # mix of points in front of (+z in the quirked convention) and behind
    pts = RNG.uniform(-1.0, 1.0, (128, 3)).astype(np.float32)
    pts[:64, 2] = 6.0  # behind camera under the +z quirk (cam z = pt_z - 4)
    pts[64:, 2] = 2.0

    sampler = _feature_sampler(
        jnp.asarray(feat), jnp.asarray(pose), focal, H, W,
        align_corners=False, invalid_fill="mean",
    )
    got = np.asarray(sampler(jnp.asarray(pts)))

    # torch oracle
    tp = torch.from_numpy(pts)
    tpose = torch.from_numpy(pose)
    homo = torch.cat([tp, torch.ones_like(tp[:, :1])], dim=-1)
    cam = torch.matmul(homo, torch.inverse(tpose).T)
    valid = cam[:, 2] > 0
    assert bool(valid.any()) and not bool(valid.all())
    x = cam[:, 0] / (cam[:, 2] + 1e-8) * focal + W / 2
    y = cam[:, 1] / (cam[:, 2] + 1e-8) * focal + H / 2
    grid = torch.stack(((x / W) * 2 - 1, (y / H) * 2 - 1), dim=-1)
    gmap = torch.from_numpy(feat).permute(2, 0, 1)[None]
    sampled = F.grid_sample(
        gmap, grid.view(1, -1, 1, 2), align_corners=False, mode="bilinear",
        padding_mode="zeros",
    )[0, :, :, 0].T
    mean = sampled.mean(dim=0, keepdim=True)
    want = torch.where(valid.unsqueeze(-1), sampled, mean.expand_as(sampled))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def test_script_configs_load():
    for name, viewdirs, rank, freeze in [
        ("script_baseline", False, 0, 0),
        ("script_lora", False, 4, 51),
        ("script_projection", True, 16, 0),
        ("script_dino_lora_pose", True, 16, 0),
    ]:
        cfg = load_config(f"experiments/{name}.yaml")
        assert cfg.dino.use_dino
        assert cfg.dino.model_type == "patch_embed"
        assert cfg.dino.output_dim == 768
        assert cfg.dino.align_corners is True
        assert cfg.nerf.use_viewdirs == viewdirs
        assert cfg.nerf.lora_rank == rank
        assert cfg.optimizer.lora_only_after_epoch == freeze
        # full-image batches at each phase resolution
        for p in cfg.phases:
            assert p.batch_size == p.H * p.W
    # script schedules: baseline switches at 20/60, the others at 50/100
    cb = load_config("experiments/script_baseline.yaml")
    assert [(p.start_epoch, p.H, p.n_samples) for p in cb.phases] == [
        (0, 16, 32), (20, 32, 32), (60, 64, 32)
    ]
    cl = load_config("experiments/script_lora.yaml")
    assert [(p.start_epoch, p.H, p.n_samples) for p in cl.phases] == [
        (0, 16, 32), (50, 32, 64), (100, 64, 64)
    ]


def test_invalid_fill_defaults():
    # module arch (train_multiscale surface) defaults to the mean-fill quirk
    cfg = config_from_dict({"nerf_model": {"arch": "module"},
                            "model": {"use_dino": True}})
    assert cfg.dino.invalid_fill == "mean"
    # functional arch (train.py surface) keeps grid_sample zeros
    cfg = config_from_dict({"model": {"use_dino": True}})
    assert cfg.dino.invalid_fill == "zeros"
    # explicit setting wins
    cfg = config_from_dict({
        "nerf_model": {"arch": "module"},
        "dino_model": {"invalid_fill": "zeros"},
    })
    assert cfg.dino.invalid_fill == "zeros"


def test_patch_embed_extractor_end_to_end():
    """build_feature_extractor('patch_embed') on a [0,1] image → 14×14×768."""
    from nerf_fewshot_tpu.models.dino import build_feature_extractor

    cfg = config_from_dict({
        "model": {"use_dino": True, "dino_model_type": "patch_embed",
                  "dino_dim": 768},
    })
    apply, variables = build_feature_extractor(cfg.dino, image_size=128)
    img = RNG.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    feats = np.asarray(apply(variables, img))
    assert feats.shape == (14, 14, 768)
    assert np.isfinite(feats).all()

def _orbit_pose(theta=0.9, phi=-0.5, radius=4.0):
    """A non-identity-rotation blender-style orbit pose (the case where the
    scripts' forward-rotation projection and the proper inverse projection
    genuinely diverge)."""
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = radius
    rot_phi = np.eye(4, dtype=np.float32)
    rot_phi[1, 1] = rot_phi[2, 2] = np.cos(phi)
    rot_phi[1, 2], rot_phi[2, 1] = -np.sin(phi), np.sin(phi)
    rot_theta = np.eye(4, dtype=np.float32)
    rot_theta[0, 0] = rot_theta[2, 2] = np.cos(theta)
    rot_theta[0, 2], rot_theta[2, 0] = -np.sin(theta), np.sin(theta)
    return (rot_theta @ rot_phi @ c2w).astype(np.float32)


def _torch_script_chain(pts, pose, focal, H, W, feat, align_corners=True):
    """The standalone scripts' EXACT feature chain (train_lora.py:118-129):
    (p - t) @ R.T forward rotation, raw /z (no epsilon), no validity mask,
    grid_sample zero padding."""
    tp = torch.from_numpy(pts)
    tpose = torch.from_numpy(pose)
    pts_cam = torch.matmul(tp - tpose[:3, 3], tpose[:3, :3].T)
    x = (pts_cam[:, 0] / pts_cam[:, 2]) * focal + W / 2
    y = (pts_cam[:, 1] / pts_cam[:, 2]) * focal + H / 2
    grid = torch.stack(((x / W) * 2 - 1, (y / H) * 2 - 1), dim=-1)
    gmap = torch.from_numpy(feat).permute(2, 0, 1)[None]
    return F.grid_sample(
        gmap, grid.view(1, -1, 1, 2), align_corners=align_corners,
        mode="bilinear", padding_mode="zeros",
    )[0, :, :, 0].T.numpy()


def test_script_projection_matches_torch_on_rotated_pose():
    """projection='script' reproduces the scripts' chain on a NON-identity
    rotation pose — the regime where it differs completely from the proper
    inverse projection (reference: train_lora.py:118-124 vs
    ray_utils.py:176-209)."""
    H = W = 128
    focal = 100.0
    feat = RNG.standard_normal((14, 14, 8)).astype(np.float32)
    pose = _orbit_pose()
    # points around the origin, the scene volume the orbit pose looks at
    pts = RNG.uniform(-1.5, 1.5, (256, 3)).astype(np.float32)

    sampler = _feature_sampler(
        jnp.asarray(feat), jnp.asarray(pose), focal, H, W,
        align_corners=True, projection="script",
    )
    got = np.asarray(sampler(jnp.asarray(pts)))
    want = _torch_script_chain(pts, pose, focal, H, W, feat)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # and the proper-inverse projection lands somewhere ELSE for this pose —
    # the divergence the 'script' convention exists to reproduce
    ref_sampler = _feature_sampler(
        jnp.asarray(feat), jnp.asarray(pose), focal, H, W,
        align_corners=True, projection="reference",
    )
    ref = np.asarray(ref_sampler(jnp.asarray(pts)))
    assert float(np.abs(ref - want).max()) > 1e-3


def test_script_projection_coords_match_reference_math():
    """project_points_script's normalized coords against a literal numpy
    transcription of the scripts' projection lines."""
    from nerf_fewshot_tpu.ops.rays import project_points_script

    H, W, focal = 100, 120, 85.0
    pose = _orbit_pose(theta=-1.3, phi=0.4)
    pts = RNG.uniform(-2.0, 2.0, (64, 3)).astype(np.float32)
    got2d, gotz = project_points_script(
        jnp.asarray(pts), jnp.asarray(pose), focal, H, W
    )
    cam = (pts - pose[:3, 3]) @ pose[:3, :3].T
    x = cam[:, 0] / cam[:, 2] * focal + W / 2
    y = cam[:, 1] / cam[:, 2] * focal + H / 2
    want = np.stack([(x / W) * 2 - 1, (y / H) * 2 - 1], axis=-1)
    np.testing.assert_allclose(np.asarray(got2d), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gotz), cam[:, 2], rtol=1e-5)


def test_projection_config_defaults():
    # patch_embed (the scripts' feature source) defaults to the script chain
    cfg = config_from_dict({
        "model": {"use_dino": True, "dino_model_type": "patch_embed"},
    })
    assert cfg.dino.projection == "script"
    # every other surface uses the proper projection
    cfg = config_from_dict({"model": {"use_dino": True}})
    assert cfg.dino.projection == "reference"
    cfg = config_from_dict({"nerf_model": {"arch": "module"},
                            "model": {"use_dino": True}})
    assert cfg.dino.projection == "reference"
    # explicit setting wins
    cfg = config_from_dict({
        "model": {"use_dino": True, "dino_model_type": "patch_embed"},
        "dino_model": {"projection": "reference"},
    })
    assert cfg.dino.projection == "reference"
    # all four script recipes pick it up
    for name in ("script_baseline", "script_lora", "script_projection",
                 "script_dino_lora_pose"):
        assert load_config(f"experiments/{name}.yaml").dino.projection == \
            "script", name


def test_focal_scaling_defaults():
    """Focal handling differs by reference surface: train.py:267 scales
    focal with downsampled resolution; the standalone scripts
    (train_lora.py:110) and train_multiscale.py:138 pass the full-res focal
    at downsampled sizes."""
    cfg = config_from_dict({})
    assert cfg.focal_scaling is True
    # explicit-phase recipes (the standalone scripts) keep full-res focal
    cfg = config_from_dict({"training": {"phases": [
        {"start": 0, "end": 5, "resolution": 16, "n_samples": 32},
    ]}})
    assert cfg.focal_scaling is False
    # module arch (train_multiscale surface) keeps full-res focal
    cfg = config_from_dict({"nerf_model": {"arch": "module"}})
    assert cfg.focal_scaling is False
    # explicit setting wins
    cfg = config_from_dict({"nerf_model": {"arch": "module"},
                            "focal_scaling": True})
    assert cfg.focal_scaling is True
    for name in ("script_baseline", "script_lora", "script_projection",
                 "script_dino_lora_pose"):
        assert load_config(f"experiments/{name}.yaml").focal_scaling is \
            False, name


def test_trainer_focal_scaling_changes_phase_rays():
    """focal_scaling=False (the scripts/multiscale surface) must generate
    low-res phase rays with the FULL-resolution focal — a narrow-FOV center
    crop — while True scales focal with the phase (train.py:267)."""
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.trainer import Trainer

    res = 32
    base = {
        "experiment": {"name": "focal"},
        "data": {"resolution": res, "num_views": 1},
        "nerf_model": {"hidden_dim": 32, "num_layers": 2},
        "training": {"epochs": 1, "batch_size": 64,
                     "progressive_schedule": {
                         "epochs_0_50": [16, 16, 8],
                         "epochs_50_100": [16, 16, 8],
                         "epochs_100_plus": [16, 16, 8]}},
        "rendering": {"chunk_size": 64},
        "output": {"save_dir": "/tmp/focal_test"},
    }
    scene = lego_like_scene()
    data = make_scene_dataset(scene, n_views=1, img_size=res, gt_samples=16)

    tr_scaled = Trainer(config_from_dict(base), data)
    pd_scaled = tr_scaled.phase_data(0)

    unscaled = dict(base)
    unscaled["focal_scaling"] = False
    cfg_u = config_from_dict(unscaled)
    assert cfg_u.focal_scaling is False
    tr_unscaled = Trainer(cfg_u, data)
    pd_u = tr_unscaled.phase_data(0)

    rd_s = np.asarray(pd_scaled.rays_d)
    rd_u = np.asarray(pd_u.rays_d)
    assert rd_s.shape == rd_u.shape
    # full-res focal at 16x16 → rays span a narrower angular cone
    assert np.abs(rd_s - rd_u).max() > 1e-3

    def cone_halfwidth(rd):
        # rays are (V, HW, 3); measure max angular deviation from center ray
        v = rd.reshape(-1, 3)
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        center = v[v.shape[0] // 2]
        return np.arccos(np.clip(v @ center, -1, 1)).max()

    assert cone_halfwidth(rd_u) < cone_halfwidth(rd_s)
