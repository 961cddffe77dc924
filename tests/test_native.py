"""Native C++ data-path parity tests: each native op must match the
framework's jnp/numpy implementation exactly (both paths are exercised
regardless of whether the native build succeeded)."""

import numpy as np
import pytest
import jax.numpy as jnp

from nerf_fewshot_tpu import native
from nerf_fewshot_tpu.ops.interp import resize_bilinear as jnp_resize
from nerf_fewshot_tpu.ops.rays import get_rays as jnp_get_rays

RNG = np.random.default_rng(9)


def random_pose():
    q, _ = np.linalg.qr(RNG.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q
    pose[:3, 3] = RNG.standard_normal(3) * 4
    return pose


def test_native_builds():
    # The toolchain is part of the environment contract; if this fails the
    # fallback still keeps the framework working, but we want to know.
    assert native.available()


def test_get_rays_matches_jax():
    pose = random_pose()
    H, W, focal = 33, 17, 25.0
    no, nd = native.get_rays(H, W, focal, pose)
    jo, jd = jnp_get_rays(H, W, focal, jnp.asarray(pose))
    np.testing.assert_allclose(no, np.asarray(jo), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(nd, np.asarray(jd), rtol=1e-5, atol=1e-6)


def test_composite_white():
    rgba = RNG.uniform(0, 1, (11, 7, 4)).astype(np.float32)
    got = native.composite_white(rgba)
    a = rgba[..., 3:]
    want = rgba[..., :3] * a + (1 - a)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("out_hw", [(8, 8), (24, 16), (32, 32)])
def test_resize_matches_jax(out_hw):
    img = RNG.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    got = native.resize_bilinear(img, *out_hw)
    want = np.asarray(jnp_resize(jnp.asarray(img), *out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gather_batch_pads():
    N, B = 20, 8
    ro = RNG.standard_normal((N, 3)).astype(np.float32)
    rd = RNG.standard_normal((N, 3)).astype(np.float32)
    tg = RNG.standard_normal((N, 3)).astype(np.float32)
    idx = np.asarray([3, 7, 1, 19, 0], np.int64)  # 5 real rows, 3 padded
    oo, od, ot = native.gather_batch(ro, rd, tg, idx, B)
    np.testing.assert_allclose(oo[:5], ro[idx])
    np.testing.assert_allclose(od[:5], rd[idx])
    np.testing.assert_allclose(ot[:5], tg[idx])
    np.testing.assert_allclose(oo[5:], np.broadcast_to(ro[0], (3, 3)))
