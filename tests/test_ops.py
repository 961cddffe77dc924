"""Unit tests for the functional ops core, checked against torch-CPU oracles.

The oracles re-state the published NeRF equations with stock torch ops (they
are not the framework's compute path) so every jnp op is pinned to the exact
numerics the reference implementation produces.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.ops import (
    positional_encoding,
    posenc_output_dim,
    get_rays,
    project_points_to_image,
    sample_along_rays,
    sample_pdf,
    hierarchical_sample,
    compute_weights,
    volume_render,
    grid_sample,
    resize_bilinear,
)

RNG = np.random.default_rng(0)


def to_np(x):
    return np.asarray(x)


# ---------------------------------------------------------------- encoding


def torch_posenc(x, num_freqs, include_input=True, log_sampling=True):
    if log_sampling:
        freqs = 2.0 ** torch.linspace(0.0, num_freqs - 1, num_freqs)
    else:
        freqs = torch.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs)
    out = [x] if include_input else []
    for f in freqs:
        out.append(torch.sin(x * f))
        out.append(torch.cos(x * f))
    return torch.cat(out, dim=-1)


@pytest.mark.parametrize("num_freqs,include_input,log_sampling", [
    (10, True, True), (4, True, True), (6, False, True), (5, True, False),
])
def test_posenc_matches_torch(num_freqs, include_input, log_sampling):
    x = RNG.standard_normal((17, 3)).astype(np.float32) * 2.0
    got = positional_encoding(jnp.asarray(x), num_freqs, include_input, log_sampling)
    want = torch_posenc(torch.from_numpy(x), num_freqs, include_input, log_sampling)
    assert got.shape[-1] == posenc_output_dim(3, num_freqs, include_input)
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_posenc_batch_shapes():
    x = RNG.standard_normal((4, 7, 3)).astype(np.float32)
    out = positional_encoding(jnp.asarray(x), 10)
    assert out.shape == (4, 7, 63)


# ---------------------------------------------------------------- rays


def torch_get_rays(H, W, focal, pose):
    i, j = torch.meshgrid(
        torch.arange(W, dtype=torch.float32),
        torch.arange(H, dtype=torch.float32),
        indexing="xy",
    )
    dirs = torch.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -torch.ones_like(i)], -1
    )
    rays_d = torch.sum(dirs[..., None, :] * pose[:3, :3], -1)
    rays_o = pose[:3, 3].expand(rays_d.shape)
    return rays_o, rays_d


def random_pose():
    # Random rotation via QR + random translation.
    q, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q.astype(np.float32)
    pose[:3, 3] = RNG.standard_normal(3).astype(np.float32) * 4
    return pose


def test_get_rays_matches_torch():
    pose = random_pose()
    H, W, focal = 12, 9, 20.0
    ro, rd = get_rays(H, W, focal, jnp.asarray(pose))
    tro, trd = torch_get_rays(H, W, focal, torch.from_numpy(pose))
    np.testing.assert_allclose(to_np(ro), tro.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(to_np(rd), trd.numpy(), rtol=1e-5, atol=1e-6)


def test_project_points_matches_torch():
    pose = random_pose()
    pts = RNG.standard_normal((200, 3)).astype(np.float32) * 3
    H, W, focal = 128, 128, 150.0

    pose_t = torch.from_numpy(pose)
    pts_t = torch.from_numpy(pts)
    pose_inv = torch.inverse(pose_t)
    homo = torch.cat([pts_t, torch.ones_like(pts_t[..., :1])], -1)
    cam = torch.matmul(homo, pose_inv.T)[..., :3]
    valid_t = cam[..., 2] > 0
    x = cam[..., 0] / (cam[..., 2] + 1e-8) * focal + W / 2
    y = cam[..., 1] / (cam[..., 2] + 1e-8) * focal + H / 2
    p2d_t = torch.stack([(x / W) * 2 - 1, (y / H) * 2 - 1], -1)

    p2d, depth, valid = project_points_to_image(
        jnp.asarray(pts), jnp.asarray(pose), focal, H, W
    )
    np.testing.assert_allclose(to_np(p2d), p2d_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(to_np(depth), cam[..., 2].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(to_np(valid), valid_t.numpy())


# ---------------------------------------------------------------- sampling


def test_stratified_deterministic():
    ro = RNG.standard_normal((5, 3)).astype(np.float32)
    rd = RNG.standard_normal((5, 3)).astype(np.float32)
    pts, z = sample_along_rays(jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0, 8)
    want_z = np.linspace(2.0, 6.0, 8, dtype=np.float32)
    np.testing.assert_allclose(to_np(z), np.broadcast_to(want_z, (5, 8)), rtol=1e-6)
    want_pts = ro[:, None, :] + rd[:, None, :] * want_z[None, :, None]
    np.testing.assert_allclose(to_np(pts), want_pts, rtol=1e-5, atol=1e-6)


def test_stratified_lindisp():
    ro = np.zeros((1, 3), np.float32)
    rd = np.ones((1, 3), np.float32)
    _, z = sample_along_rays(jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0, 5, lindisp=True)
    t = np.linspace(0, 1, 5)
    want = 1.0 / (1.0 / 2.0 * (1 - t) + 1.0 / 6.0 * t)
    np.testing.assert_allclose(to_np(z)[0], want, rtol=1e-5)


def test_stratified_perturb_within_bins():
    ro = np.zeros((64, 3), np.float32)
    rd = np.ones((64, 3), np.float32)
    _, z = sample_along_rays(
        jnp.asarray(ro), jnp.asarray(rd), 2.0, 6.0, 16, key=jax.random.key(0)
    )
    z = to_np(z)
    base = np.linspace(2.0, 6.0, 16)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert np.all(z >= lower - 1e-6) and np.all(z <= upper + 1e-6)
    assert np.all(np.diff(z, axis=-1) > 0)  # still ordered
    assert np.std(z[:, 5]) > 1e-3  # actually random


def torch_sample_pdf(z_vals, weights, n_imp, u):
    """Reference inverse-CDF math with torch ops (ray_utils.py:104-135)."""
    w = weights + 1e-5
    pdf = w / torch.sum(w, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    idx = torch.searchsorted(cdf, u, right=True)
    below = torch.clamp(idx - 1, min=0)
    above = torch.clamp(idx, max=cdf.shape[-1] - 1)
    ig = torch.stack([below, above], -1)
    mshape = [z_vals.shape[0], n_imp, cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(mshape), 2, ig)
    # clamp bin gather indices into z range (see sample_pdf docstring)
    ig_b = torch.clamp(ig, max=z_vals.shape[-1] - 1)
    bins_g = torch.gather(z_vals.unsqueeze(1).expand(mshape[:2] + [z_vals.shape[-1]]), 2, ig_b)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


def test_sample_pdf_matches_torch():
    R, S, NI = 7, 16, 12
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    w = RNG.uniform(0, 1, (R, S)).astype(np.float32)
    # deterministic u (evenly spaced) so both sides see identical uniforms
    got = sample_pdf(jnp.asarray(z), jnp.asarray(w), NI, key=None)
    u = torch.linspace(0.0, 1.0, NI).expand(R, NI).contiguous()
    want = torch_sample_pdf(torch.from_numpy(z), torch.from_numpy(w), NI, u)
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_hierarchical_merges_and_sorts():
    R, S, NI = 4, 8, 6
    ro = RNG.standard_normal((R, 3)).astype(np.float32)
    rd = RNG.standard_normal((R, 3)).astype(np.float32)
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    w = RNG.uniform(0, 1, (R, S)).astype(np.float32)
    pts, zc = hierarchical_sample(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(z), jnp.asarray(w), NI,
        key=jax.random.key(1),
    )
    zc = to_np(zc)
    assert zc.shape == (R, S + NI)
    assert np.all(np.diff(zc, axis=-1) >= 0)
    assert pts.shape == (R, S + NI, 3)


# ---------------------------------------------------------------- composite


def torch_volume_render(rgb, sigma, z_vals, rays_d, white_bkgd=False):
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    alpha = 1.0 - torch.exp(-TF.relu(sigma) * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth = torch.sum(weights * z_vals, -1)
    acc = torch.sum(weights, -1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)[..., None]
    return rgb_map, depth, acc, weights


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_volume_render_matches_torch(white_bkgd):
    R, S = 9, 16
    rgb = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma = RNG.standard_normal((R, S)).astype(np.float32) * 2
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    rd = RNG.standard_normal((R, 3)).astype(np.float32)

    out = volume_render(
        jnp.asarray(rgb), jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rd),
        white_bkgd=white_bkgd,
    )
    t_rgb, t_depth, t_acc, t_w = torch_volume_render(
        torch.from_numpy(rgb), torch.from_numpy(sigma), torch.from_numpy(z),
        torch.from_numpy(rd), white_bkgd,
    )
    np.testing.assert_allclose(to_np(out.rgb), t_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(out.depth), t_depth.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(to_np(out.acc), t_acc.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to_np(out.weights), t_w.numpy(), rtol=1e-4, atol=1e-5)


def test_volume_render_gradients_match_torch():
    R, S = 5, 8
    rgb = RNG.uniform(0, 1, (R, S, 3)).astype(np.float32)
    sigma = RNG.standard_normal((R, S)).astype(np.float32)
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    rd = RNG.standard_normal((R, 3)).astype(np.float32)

    def loss_jax(sig):
        out = volume_render(jnp.asarray(rgb), sig, jnp.asarray(z), jnp.asarray(rd))
        return jnp.sum(out.rgb ** 2)

    g = jax.grad(loss_jax)(jnp.asarray(sigma))

    sig_t = torch.from_numpy(sigma).requires_grad_(True)
    t_rgb, _, _, _ = torch_volume_render(
        torch.from_numpy(rgb), sig_t, torch.from_numpy(z), torch.from_numpy(rd)
    )
    (t_rgb ** 2).sum().backward()
    np.testing.assert_allclose(to_np(g), sig_t.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_weights_sum_to_acc_below_one():
    R, S = 6, 12
    sigma = np.abs(RNG.standard_normal((R, S)).astype(np.float32))
    z = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    rd = RNG.standard_normal((R, 3)).astype(np.float32)
    w = compute_weights(jnp.asarray(sigma), jnp.asarray(z), jnp.asarray(rd))
    assert np.all(to_np(jnp.sum(w, -1)) <= 1.0 + 1e-5)


# ---------------------------------------------------------------- interp


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(align_corners):
    H, W, C = 14, 14, 5
    feats = RNG.standard_normal((H, W, C)).astype(np.float32)
    # include in-bounds, near-edge and out-of-bounds points
    pts = RNG.uniform(-1.4, 1.4, (300, 2)).astype(np.float32)

    got = grid_sample(jnp.asarray(feats), jnp.asarray(pts), align_corners=align_corners)

    fg = torch.from_numpy(feats).permute(2, 0, 1).unsqueeze(0)  # (1,C,H,W)
    grid = torch.from_numpy(pts).unsqueeze(0).unsqueeze(2)  # (1,N,1,2)
    want = TF.grid_sample(
        fg, grid, mode="bilinear", padding_mode="zeros", align_corners=align_corners
    ).squeeze(-1).squeeze(0).permute(1, 0)
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(7, 7), (32, 32), (16, 24)])
@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear_matches_torch(out_hw, align_corners):
    H, W, C = 16, 16, 3
    img = RNG.uniform(0, 1, (H, W, C)).astype(np.float32)
    got = resize_bilinear(jnp.asarray(img), out_hw[0], out_hw[1], align_corners)
    want = TF.interpolate(
        torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0),
        size=out_hw, mode="bilinear", align_corners=align_corners,
    ).squeeze(0).permute(1, 2, 0)
    np.testing.assert_allclose(to_np(got), want.numpy(), rtol=1e-4, atol=1e-5)
