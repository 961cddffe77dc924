"""Parity of framework ops against the reference's OWN imported source.

VERDICT r4 item 2: previous rounds compared against torch oracles re-typed by
the builder; a transcription error would have passed silently on both sides.
Here the oracle IS the mounted reference code (`/root/reference/src`),
imported via tests/reference_oracle.py and executed directly. Tests skip
cleanly when the reference is unmounted.

Coverage (reference file:line cited per test):
  * positional encodings ×2 (positional_encoding.py:5-33, nerf_mlp.py:6-39)
  * get_rays ×2 (ray_utils.py:4-37, ray_sampler.py:4-30)
  * stratified samplers ×2 incl. lindisp (ray_utils.py:39-84,
    ray_sampler.py:32-61)
  * 3D→2D projection (ray_utils.py:176-209)
  * get_ray_batch chunking (ray_utils.py:145-174)
  * volume renderers ×2, values AND gradients (volume_renderer.py:4-43,
    nerf_mlp.py:160-215)
  * NeRFLoss all three terms (nerf_mlp.py:217-258)
  * baseline NeRFMLP end-to-end with transplanted weights
    (nerf_model.py:5-24 + positional_encoding.py)
  * Blender loader vs data_loader.py:8-64 on a generated scene
  * pin: hierarchical_sampling (ray_utils.py:86-143) crashes as committed
    (the transcribed oracle in test_ops.py remains authoritative there)
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.ops import (
    positional_encoding,
    get_rays,
    project_points_to_image,
    sample_along_rays,
    volume_render,
)
from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.training.config import LossConfig
from nerf_fewshot_tpu.training.losses import nerf_loss
from nerf_fewshot_tpu.utils.torch_import import import_nerf_mlp_state_dict

import reference_oracle as ref

RNG = np.random.default_rng(5)


def to_np(x):
    return np.asarray(x)


# ------------------------------------------------------------ encodings


@pytest.mark.parametrize("num_freqs,include_input,log_sampling", [
    (10, True, True), (4, True, True), (6, False, True), (5, True, False),
])
def test_posenc_vs_reference_module(num_freqs, include_input, log_sampling):
    pe_mod = ref.load("positional_encoding")
    enc = pe_mod.PositionalEncoding(
        num_freqs=num_freqs, include_input=include_input,
        log_sampling=log_sampling,
    )
    x = RNG.standard_normal((13, 3)).astype(np.float32) * 2.0
    want = enc(torch.from_numpy(x))
    got = positional_encoding(
        jnp.asarray(x), num_freqs, include_input, log_sampling
    )
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_posenc_vs_reference_nerf_mlp_dup(
):
    nm = ref.load("nerf_mlp")
    enc = nm.PositionalEncoding(num_freqs=10, include_input=True)
    x = RNG.standard_normal((9, 3)).astype(np.float32)
    want = enc(torch.from_numpy(x))
    got = positional_encoding(jnp.asarray(x), 10)
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-5, atol=1e-5)
    assert enc.get_output_dim(3) == got.shape[-1]


# ------------------------------------------------------------ rays


def _random_pose():
    q, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q.astype(np.float32)
    pose[:3, 3] = RNG.standard_normal(3).astype(np.float32) * 4
    return pose


@pytest.mark.parametrize("modname", ["ray_utils", "ray_sampler"])
def test_get_rays_vs_reference(modname):
    mod = ref.load(modname)
    pose = _random_pose()
    H, W, focal = 11, 8, 17.5
    want_o, want_d = mod.get_rays(H, W, focal, torch.from_numpy(pose))
    got_o, got_d = get_rays(H, W, focal, jnp.asarray(pose))
    np.testing.assert_allclose(to_np(got_o), want_o.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(to_np(got_d), want_d.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("lindisp", [False, True])
def test_stratified_vs_reference_flat(lindisp):
    ru = ref.load("ray_utils")
    ro = RNG.standard_normal((6, 3)).astype(np.float32)
    rd = RNG.standard_normal((6, 3)).astype(np.float32)
    want_pts, want_z = ru.sample_points_along_rays(
        torch.from_numpy(ro), torch.from_numpy(rd), 2.0, 6.0, 9,
        perturb=False, lindisp=lindisp,
    )
    got_pts, got_z = sample_along_rays(
        jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0, 9, lindisp=lindisp
    )
    np.testing.assert_allclose(to_np(got_z), want_z.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(to_np(got_pts), want_pts.numpy(), rtol=1e-5, atol=1e-5)


def test_stratified_vs_reference_hw_variant():
    rs = ref.load("ray_sampler")
    H, W = 4, 5
    ro = RNG.standard_normal((H, W, 3)).astype(np.float32)
    rd = RNG.standard_normal((H, W, 3)).astype(np.float32)
    want_pts, want_z = rs.sample_points_along_rays(
        torch.from_numpy(ro), torch.from_numpy(rd), 2.0, 6.0, 7, perturb=False
    )
    got_pts, got_z = sample_along_rays(
        jnp.asarray(ro.reshape(-1, 3)), jnp.asarray(rd.reshape(-1, 3)),
        2.0, 6.0, 7,
    )
    np.testing.assert_allclose(
        to_np(got_z).reshape(H, W, 7), want_z.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        to_np(got_pts).reshape(H, W, 7, 3), want_pts.numpy(),
        rtol=1e-5, atol=1e-5,
    )


def test_projection_vs_reference():
    ru = ref.load("ray_utils")
    pose = _random_pose()
    pts = RNG.standard_normal((150, 3)).astype(np.float32) * 3
    H, W, focal = 128, 128, 150.0
    want = ru.project_points_to_image(
        torch.from_numpy(pts), torch.from_numpy(pose), focal, H, W
    )
    want_p2d, want_depth, want_valid = want
    got_p2d, got_depth, got_valid = project_points_to_image(
        jnp.asarray(pts), jnp.asarray(pose), focal, H, W
    )
    np.testing.assert_allclose(to_np(got_p2d), want_p2d.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(to_np(got_depth), want_depth.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(to_np(got_valid), want_valid.numpy())


def test_ray_batch_chunking_vs_reference():
    """The trainer's padded-batch path must cover exactly the rays the
    reference generator yields (same flattening order, same indices)."""
    ru = ref.load("ray_utils")
    H, W, B = 6, 7, 16
    ro = RNG.standard_normal((H, W, 3)).astype(np.float32)
    rd = RNG.standard_normal((H, W, 3)).astype(np.float32)
    seen = []
    for o, d, idx in ru.get_ray_batch(
        torch.from_numpy(ro), torch.from_numpy(rd), batch_size=B
    ):
        assert o.shape[0] == d.shape[0] == idx.shape[0] <= B
        np.testing.assert_allclose(
            o.numpy(), ro.reshape(-1, 3)[idx.numpy()], rtol=0, atol=0
        )
        seen.append(idx.numpy())
    seen = np.concatenate(seen)
    np.testing.assert_array_equal(seen, np.arange(H * W))


# ------------------------------------------------------------ compositing


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_module_volume_renderer_vs_reference(white_bkgd):
    nm = ref.load("nerf_mlp")
    vr = nm.VolumeRenderer()
    vr.eval()  # noise path off (self.training False)
    R, S = 9, 16
    rgb = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma = (RNG.standard_normal((R, S)) * 2).astype(np.float32)
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), -1)
    rd = RNG.standard_normal((R, 3)).astype(np.float32)

    w_rgb, w_depth, w_w = vr(
        torch.from_numpy(rgb), torch.from_numpy(sigma)[..., None],
        torch.from_numpy(z), torch.from_numpy(rd), white_bkgd=white_bkgd,
    )
    out = volume_render(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rd),
        white_bkgd=white_bkgd,
    )
    np.testing.assert_allclose(to_np(out.rgb), w_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(out.depth), w_depth.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_np(out.weights), w_w.numpy(), rtol=1e-4, atol=1e-5)


def test_module_volume_renderer_grads_vs_reference():
    nm = ref.load("nerf_mlp")
    vr = nm.VolumeRenderer()
    vr.eval()
    R, S = 5, 8
    rgb = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma = RNG.standard_normal((R, S)).astype(np.float32)
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), -1)
    rd = RNG.standard_normal((R, 3)).astype(np.float32)

    sig_t = torch.from_numpy(sigma).requires_grad_(True)
    rgb_t = torch.from_numpy(rgb).requires_grad_(True)
    w_rgb, _, _ = vr(rgb_t, sig_t[..., None], torch.from_numpy(z),
                     torch.from_numpy(rd))
    (w_rgb ** 2).sum().backward()

    def loss(sig, rgb_in):
        out = volume_render(rgb_in, sig, jnp.asarray(z), jnp.asarray(rd))
        return jnp.sum(out.rgb ** 2)

    gs, gr = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(sigma), jnp.asarray(rgb)
    )
    np.testing.assert_allclose(to_np(gs), sig_t.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(to_np(gr), rgb_t.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_functional_volume_renderer_vs_reference():
    """volume_render_radiance (H,W,N,4) variant, reference's own module."""
    vrm = ref.load("volume_renderer")
    H, W, S = 4, 6, 12
    rgb = RNG.uniform(0, 1, (H, W, S, 3)).astype(np.float32)
    sigma = (RNG.standard_normal((H, W, S)) * 2).astype(np.float32)
    z = np.sort(RNG.uniform(2.0, 6.0, (H, W, S)).astype(np.float32), -1)
    rd = RNG.standard_normal((H, W, 3)).astype(np.float32)

    rgb_sigma = torch.from_numpy(
        np.concatenate([rgb, sigma[..., None]], -1)
    )
    want = vrm.volume_render_radiance(
        rgb_sigma, torch.from_numpy(z), torch.from_numpy(rd)
    )
    out = volume_render(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rd)
    )
    np.testing.assert_allclose(to_np(out.rgb), want.numpy(), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------ loss


def test_nerf_loss_vs_reference_all_terms():
    nm = ref.load("nerf_mlp")
    crit = nm.NeRFLoss(rgb_weight=1.0, depth_weight=0.1,
                       regularization_weight=0.01)
    R, S = 24, 16
    pred_rgb = RNG.uniform(0, 1, (R, 3)).astype(np.float32)
    tgt_rgb = RNG.uniform(0, 1, (R, 3)).astype(np.float32)
    pred_depth = RNG.uniform(2, 6, (R,)).astype(np.float32)
    tgt_depth = RNG.uniform(2, 6, (R,)).astype(np.float32)
    weights = RNG.uniform(0, 0.2, (R, S)).astype(np.float32)

    want = crit(
        {"rgb": torch.from_numpy(pred_rgb),
         "depth": torch.from_numpy(pred_depth),
         "weights": torch.from_numpy(weights)},
        {"rgb": torch.from_numpy(tgt_rgb),
         "depth": torch.from_numpy(tgt_depth)},
    )
    got = nerf_loss(
        jnp.asarray(pred_rgb), jnp.asarray(tgt_rgb),
        LossConfig(rgb_weight=1.0, depth_weight=0.1, reg_weight=0.01),
        pred_depth=jnp.asarray(pred_depth),
        target_depth=jnp.asarray(tgt_depth),
        weights=jnp.asarray(weights),
    )
    for key in ("rgb", "depth", "regularization", "total"):
        np.testing.assert_allclose(
            float(got[key]), float(want[key]), rtol=1e-5, atol=1e-7,
            err_msg=key,
        )


# ------------------------------------------------------------ MLP e2e


def test_baseline_nerf_mlp_vs_reference_transplanted():
    """PE(10) → reference nerf_model.NeRFMLP vs our NeRFMLP, same weights.

    The reference forward returns cat([sigmoid(rgb), raw sigma], -1)
    (nerf_model.py:15-24) on pre-encoded input; ours encodes internally and
    returns the tuple. Weight transplant goes through the production
    torch-import path.
    """
    pe_mod = ref.load("positional_encoding")
    nmod = ref.load("nerf_model")
    torch.manual_seed(11)
    enc = pe_mod.PositionalEncoding(num_freqs=10)
    tm = nmod.NeRFMLP(pos_dim=63, hidden_dim=64, n_layers=3)

    model = NeRFMLP(pos_freq=10, use_viewdirs=False, hidden_dim=64,
                    num_layers=3)
    params0 = model.init(jax.random.key(0), jnp.zeros((1, 3)))["params"]
    params = import_nerf_mlp_state_dict(params0, tm.state_dict())

    pts = (RNG.standard_normal((40, 3)) * 2).astype(np.float32)
    with torch.no_grad():
        want = tm(enc(torch.from_numpy(pts)))
    rgb, sigma = model.apply({"params": params}, jnp.asarray(pts))
    np.testing.assert_allclose(
        to_np(rgb), want[..., :3].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        to_np(sigma).reshape(-1), want[..., 3].numpy(), rtol=1e-4, atol=1e-4
    )


# ------------------------------------------------------------ data loader


def test_blender_loader_vs_reference(tmp_path):
    """Generate a tiny scene on disk, load through BOTH loaders, compare
    images / poses / focal (incl. the double-focal-scale quirk both share
    under img_size resizing — data_loader.py:38-62)."""
    dl = ref.load("data_loader")
    from nerf_fewshot_tpu.data.blender import load_blender, save_blender

    H0 = W0 = 16
    n = 3
    images = RNG.uniform(0, 1, (n, H0, W0, 4)).astype(np.float32)
    poses = np.stack([_random_pose() for _ in range(n)])
    save_blender(str(tmp_path), "train", images, poses,
                 camera_angle_x=0.6911112070083618)

    want_imgs, want_poses, (wh, ww, wfocal) = dl.load_blender_data(
        str(tmp_path), split="train", img_size=8
    )
    got = load_blender(str(tmp_path), split="train", img_size=8,
                       keep_alpha=False)
    assert (got.H, got.W) == (wh, ww)
    np.testing.assert_allclose(got.focal, wfocal, rtol=1e-6)
    np.testing.assert_allclose(got.poses, want_poses.numpy(), rtol=1e-6)
    # torch loader returns (N,3,H,W); ours channel-last
    np.testing.assert_allclose(
        got.images, want_imgs.permute(0, 2, 3, 1).numpy(),
        rtol=1e-5, atol=2e-3,  # both go through uint8 PNG + LANCZOS
    )


# ------------------------------------------------------------ pins


def test_reference_hierarchical_sampling_is_broken_as_committed():
    """ray_utils.hierarchical_sampling expands z_vals (last dim N) to the
    cdf's N+1 (ray_utils.py:128-131) — torch rejects the expand. Pin the
    crash so the transcribed sample_pdf oracle in test_ops.py remains
    justified (VERDICT r4 'keep transcribed oracles only where the
    reference is broken')."""
    ru = ref.load("ray_utils")
    R, S = 4, 8
    ro = torch.randn(R, 3)
    rd = torch.randn(R, 3)
    z = torch.sort(torch.rand(R, S) * 4 + 2, -1).values
    w = torch.rand(R, S)
    with pytest.raises(RuntimeError):
        ru.hierarchical_sampling(ro, rd, z, w, 5, perturb=False)


def test_reference_evaluate_py_truncated():
    """evaluate.py ends mid-expression (evaluate.py:306-314) — pin the
    SyntaxError that justifies the completed re-implementation in
    training/evaluate.py."""
    import os
    path = os.path.join(ref.REFERENCE_ROOT, "src/training/evaluate.py")
    if not os.path.isfile(path):
        pytest.skip("reference not mounted")
    src = open(path).read()
    with pytest.raises(SyntaxError):
        compile(src, path, "exec")


# ------------------------------------------------------------ module stack


def _put(params, name, lin):
    params[name]["kernel"] = jnp.asarray(
        lin.weight.detach().numpy().T)
    params[name]["bias"] = jnp.asarray(lin.bias.detach().numpy())


def test_density_mlp_vs_reference_transplanted():
    """DensityMLP parity against the reference's own class
    (nerf_mlp.py:41-66): ReLU trunk -> relu'd density head + feature head."""
    import flax

    from nerf_fewshot_tpu.models.mlp import DensityMLP

    nm = ref.load("nerf_mlp")
    torch.manual_seed(3)
    tm = nm.DensityMLP(input_dim=63, hidden_dim=64, num_layers=3)

    model = DensityMLP(hidden_dim=64, num_layers=3)
    params = flax.core.unfreeze(
        model.init(jax.random.key(0), jnp.zeros((1, 63)))["params"]
    )
    for i in range(3):
        _put(params, f"layer_{i}", tm.density_layers[2 * i])
    _put(params, "density_head", tm.density_head)
    _put(params, "feature_head", tm.feature_head)

    x = RNG.standard_normal((20, 63)).astype(np.float32)
    with torch.no_grad():
        want_d, want_f = tm(torch.from_numpy(x))
    got_d, got_f = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(to_np(got_d), want_d.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(got_f), want_f.numpy(), rtol=1e-4, atol=1e-4)


def test_color_mlp_vs_reference_transplanted():
    """ColorMLP parity against the reference's own class
    (nerf_mlp.py:68-84): [features || dir_enc] -> 2 hidden -> sigmoid RGB."""
    import flax

    from nerf_fewshot_tpu.models.mlp import ColorMLP

    nm = ref.load("nerf_mlp")
    torch.manual_seed(4)
    tm = nm.ColorMLP(feature_dim=64, dir_dim=27, hidden_dim=32)

    model = ColorMLP(hidden_dim=32)
    params = flax.core.unfreeze(
        model.init(
            jax.random.key(0), jnp.zeros((1, 64)), jnp.zeros((1, 27))
        )["params"]
    )
    _put(params, "layer_0", tm.color_layers[0])
    _put(params, "layer_1", tm.color_layers[2])
    _put(params, "rgb", tm.color_layers[4])

    feats = RNG.standard_normal((20, 64)).astype(np.float32)
    dirs = RNG.standard_normal((20, 27)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(feats), torch.from_numpy(dirs))
    got = model.apply({"params": params}, jnp.asarray(feats), jnp.asarray(dirs))
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_nerf_with_dino_full_stack_vs_reference():
    """Full NeRFWithDINO stack (nerf_mlp.py:86-158) — PE -> NeRFDINOFusion
    (lora_dino.py:146-193) -> DensityMLP -> view-dependent ColorMLP —
    against the reference's OWN class with weights transplanted through the
    production torch-import path (previously the stack oracle was a
    builder-transcribed torch module). Values AND gradients."""
    from nerf_fewshot_tpu.models import NeRFWithDINO
    from nerf_fewshot_tpu.utils.torch_import import (
        import_nerf_with_dino_state_dict,
    )

    ref.load("lora_dino")  # registers the bare name nerf_mlp lazily imports
    nm = ref.load("nerf_mlp")
    torch.manual_seed(9)
    tm = nm.NeRFWithDINO(pos_freq=6, dir_freq=2, dino_dim=32, hidden_dim=64,
                         num_density_layers=3)
    tm.eval()

    model = NeRFWithDINO(pos_freq=6, dir_freq=2, dino_dim=32, hidden_dim=64,
                         num_density_layers=3)
    pts0 = jnp.zeros((1, 3))
    params0 = model.init(
        jax.random.key(0), pts0, pts0, jnp.zeros((1, 32))
    )["params"]
    params = import_nerf_with_dino_state_dict(params0, tm.state_dict())

    pts = (RNG.standard_normal((30, 3)) * 2).astype(np.float32)
    dirs = RNG.standard_normal((30, 3)).astype(np.float32)
    dino = RNG.standard_normal((30, 32)).astype(np.float32)

    pts_t = torch.from_numpy(pts)
    dirs_t = torch.from_numpy(dirs)
    dino_t = torch.from_numpy(dino).requires_grad_(True)
    want_rgb, want_density = tm(pts_t, dirs_t, dino_t)
    (want_rgb.sum() + want_density.sum()).backward()

    def fwd(p, dino_in):
        return model.apply({"params": p}, jnp.asarray(pts),
                           jnp.asarray(dirs), dino_in)

    rgb, density = fwd(params, jnp.asarray(dino))
    np.testing.assert_allclose(
        to_np(rgb), want_rgb.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        to_np(density), want_density.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    # gradient w.r.t. the dino features through the reference's own stack
    g = jax.grad(
        lambda d: jnp.sum(fwd(params, d)[0]) + jnp.sum(fwd(params, d)[1])
    )(jnp.asarray(dino))
    np.testing.assert_allclose(
        to_np(g), dino_t.grad.numpy(), rtol=1e-3, atol=1e-4
    )


def test_lora_linear_vs_reference_transplanted():
    """LoRA layer math against the reference's OWN LoRALinear
    (lora_dino.py:7-32): out = original(x) + (alpha/rank) * B(dropout(A(x))),
    eval mode (dropout off), with a randomized B so the update is live."""
    import flax
    import torch.nn as tnn

    from nerf_fewshot_tpu.models.lora import LoRADense

    ld = ref.load("lora_dino")
    torch.manual_seed(12)
    base = tnn.Linear(16, 24)
    tm = ld.LoRALinear(base, rank=4, alpha=16)
    tnn.init.normal_(tm.lora_B.weight)  # B=0 would hide the LoRA term
    tm.eval()

    model = LoRADense(features=24, rank=4, alpha=16.0)
    params = flax.core.unfreeze(
        model.init(jax.random.key(0), jnp.zeros((1, 16)))["params"]
    )
    _put(params, "base", tm.original)
    params["lora_a"] = jnp.asarray(tm.lora_A.weight.detach().numpy().T)
    params["lora_b"] = jnp.asarray(tm.lora_B.weight.detach().numpy().T)

    x = RNG.standard_normal((25, 16)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    got = model.apply({"params": params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-4, atol=1e-5)

    # the LoRA term is actually live in this comparison
    with torch.no_grad():
        base_only = tm.original(torch.from_numpy(x))
    assert float((want - base_only).abs().max()) > 1e-3
