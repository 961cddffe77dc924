"""Pallas fused-render kernel equivalence tests (interpret mode on CPU):
forward outputs and parameter gradients must match the XLA pipeline."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.ops.composite import volume_render
from nerf_fewshot_tpu.ops.encoding import positional_encoding
from nerf_fewshot_tpu.render.kernels import fused_render, pack_params

RNG = np.random.default_rng(11)

R, S = 16, 16
HIDDEN = 128
N_LAYERS = 3
POS_FREQ, DIR_FREQ = 10, 4  # 63 + 27 = 90 → padded to 128


def setup(white_bkgd=False, lora_rank=0):
    model = NeRFMLP(
        pos_freq=POS_FREQ, dir_freq=DIR_FREQ, use_viewdirs=True,
        hidden_dim=HIDDEN, num_layers=N_LAYERS, lora_rank=lora_rank,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    if lora_rank:
        # push lora_b off zero so the adapter affects outputs
        for i in range(N_LAYERS):
            params[f"trunk_{i}"]["lora_b"] = jnp.asarray(
                RNG.standard_normal(
                    params[f"trunk_{i}"]["lora_b"].shape
                ).astype(np.float32) * 0.02
            )

    rays_o = jnp.asarray(RNG.standard_normal((R, 3)).astype(np.float32))
    rays_d = jnp.asarray(RNG.standard_normal((R, 3)).astype(np.float32))
    z = jnp.asarray(
        np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), axis=-1)
    )
    return model, params, rays_o, rays_d, z


def xla_reference(model, params, rays_o, rays_d, z, white_bkgd):
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    rgb, sigma = model.apply(
        {"params": params}, pts.reshape(-1, 3), dirs.reshape(-1, 3)
    )
    out = volume_render(
        rgb.reshape(R, S, 3), sigma.reshape(R, S), z, rays_d,
        white_bkgd=white_bkgd,
    )
    return out


def kernel_inputs(params, rays_o, rays_d, z, lora_rank=0):
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    enc = jnp.concatenate(
        [
            positional_encoding(pts.reshape(-1, 3), POS_FREQ),
            positional_encoding(dirs.reshape(-1, 3), DIR_FREQ),
        ],
        axis=-1,
    )
    x = jnp.concatenate(
        [enc, jnp.zeros((enc.shape[0], 128 - enc.shape[1]), enc.dtype)], axis=-1
    )
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    packed = pack_params(params, N_LAYERS, HIDDEN)
    return x, dnorm, packed


@pytest.mark.parametrize("white_bkgd", [False, True])
def test_fused_forward_matches_xla(white_bkgd):
    model, params, rays_o, rays_d, z = setup(white_bkgd)
    want = xla_reference(model, params, rays_o, rays_d, z, white_bkgd)
    x, dnorm, (w0, b0, wh, bh, wout, bout) = kernel_inputs(params, rays_o, rays_d, z)
    rgb, depth, acc, weights = fused_render(
        x, z, dnorm, w0, b0, wh, bh, wout, bout, white_bkgd, 8, True
    )
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(want.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth[:, 0]), np.asarray(want.depth),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc[:, 0]), np.asarray(want.acc),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights), np.asarray(want.weights),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("lora_rank", [0, 4])
def test_fused_param_gradients_match_xla(lora_rank):
    model, params, rays_o, rays_d, z = setup(lora_rank=lora_rank)
    tgt = jnp.asarray(RNG.uniform(0, 1, (R, 3)).astype(np.float32))

    def loss_xla(p):
        out = xla_reference(model, p, rays_o, rays_d, z, False)
        return (jnp.mean((out.rgb - tgt) ** 2) + 0.1 * jnp.mean(out.depth)
                + 0.01 * jnp.mean(out.weights ** 2))

    def loss_fused(p):
        x, dnorm, (w0, b0, wh, bh, wout, bout) = kernel_inputs(
            p, rays_o, rays_d, z, lora_rank
        )
        rgb, depth, acc, weights = fused_render(
            x, z, dnorm, w0, b0, wh, bh, wout, bout, False, 8, True
        )
        return (jnp.mean((rgb - tgt) ** 2) + 0.1 * jnp.mean(depth[:, 0])
                + 0.01 * jnp.mean(weights ** 2))

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(g1)[0]
    flat2 = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_flatten_with_path(g2)[0]
    )
    for kp, v1 in flat1:
        v2 = flat2[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=2e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}",
        )


def test_fused_hierarchical_matches_xla_pipeline():
    """Coarse+fine rendering: the fused backend (two kernel calls with the
    importance sampler between them) must match the XLA pipeline, values and
    parameter gradients, when sampling is deterministic (perturb off — the
    backends split PRNG keys differently, so only the deterministic path is
    comparable point-for-point)."""
    from nerf_fewshot_tpu.render.fused import fused_render_rays
    from nerf_fewshot_tpu.render.pipeline import RenderSettings, render_rays

    model, params, rays_o, rays_d, _ = setup()
    settings = RenderSettings(
        near=2.0, far=6.0, n_samples=S, n_importance=S, perturb=False
    )
    tgt = jnp.asarray(RNG.uniform(0, 1, (R, 3)).astype(np.float32))

    def loss_xla(p):
        def model_fn(pts, dirs, dino):
            return model.apply({"params": p}, pts, dirs)

        out = render_rays(model_fn, rays_o, rays_d, settings, key=None)
        return jnp.mean((out.rgb - tgt) ** 2), out

    def loss_fused(p):
        out = fused_render_rays(
            p, rays_o, rays_d, settings, pos_freq=POS_FREQ,
            dir_freq=DIR_FREQ, num_layers=N_LAYERS, hidden_dim=HIDDEN,
            key=None, tile_rays=8, interpret=True,
        )
        return jnp.mean((out.rgb - tgt) ** 2), out

    (l1, o1), g1 = jax.value_and_grad(loss_xla, has_aux=True)(params)
    (l2, o2), g2 = jax.value_and_grad(loss_fused, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(o2.rgb), np.asarray(o1.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2.depth), np.asarray(o1.depth),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)


def test_fused_acc_gradient_white_bkgd():
    """White-background couples rgb to acc; gradient path must survive."""
    model, params, rays_o, rays_d, z = setup(white_bkgd=True)
    tgt = jnp.asarray(RNG.uniform(0, 1, (R, 3)).astype(np.float32))

    def loss_xla(p):
        out = xla_reference(model, p, rays_o, rays_d, z, True)
        return jnp.mean((out.rgb - tgt) ** 2)

    def loss_fused(p):
        x, dnorm, (w0, b0, wh, bh, wout, bout) = kernel_inputs(p, rays_o, rays_d, z)
        rgb, _, _, _ = fused_render(
            x, z, dnorm, w0, b0, wh, bh, wout, bout, True, 8, True
        )
        return jnp.mean((rgb - tgt) ** 2)

    g1 = jax.grad(loss_xla)(params)
    g2 = jax.grad(loss_fused)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_pick_tile_rays_mosaic_rule():
    """Ray-tile sizes must divide R and satisfy Mosaic's sublane rule
    (multiple of 8, or the full array). Regression: R=1024, S=96 (merged
    hierarchical samples) used to pick R_T=4 → TPU lowering error."""
    from nerf_fewshot_tpu.render.kernels import _pick_tile_rays

    for R in (1024, 2048, 16, 24, 12, 7):
        for cap in (1, 4, 6, 9, 64, 4096):
            rt = _pick_tile_rays(R, cap)
            assert R % rt == 0, (R, cap, rt)
            assert rt % 8 == 0 or rt == R, (R, cap, rt)


def test_fwd_pe_kernel_matches_canonical_forward():
    """Inline-PE forward kernel == canonical encode_points + forward kernel
    (values; same weights, row-permuted)."""
    import jax
    from nerf_fewshot_tpu.render.fused import encode_points
    from nerf_fewshot_tpu.render.kernels import (
        fused_render_fwd_pe, pack_params,
    )
    from nerf_fewshot_tpu.render.train_kernel import _raw_block, pe_layout
    from nerf_fewshot_tpu.ops.sampling import sample_along_rays

    model, params, rays_o, rays_d, _ = setup()
    pts, z = sample_along_rays(rays_o, rays_d, 2.0, 6.0, S, key=None)
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    x = encode_points(pts, rays_d, POS_FREQ, DIR_FREQ, True, None)
    packed = pack_params(params, N_LAYERS, HIDDEN, d_pad=x.shape[-1])
    from nerf_fewshot_tpu.render.kernels import _fused_fwd_impl
    want = _fused_fwd_impl(x, z, dnorm, *packed, False, 8, True)

    perm, e2, c, x_dim = pe_layout(POS_FREQ, DIR_FREQ, True, 0)
    packed_pe = pack_params(params, N_LAYERS, HIDDEN,
                            d_pad=-(-x_dim // 128) * 128, row_perm=perm)
    raw = _raw_block(pts, rays_d, True)
    feats = jnp.zeros((raw.shape[0], 8), raw.dtype)
    got = fused_render_fwd_pe(raw, feats, z, dnorm, jnp.asarray(e2),
                              jnp.asarray(c), packed_pe, False, tile_rays=8,
                              interpret=True)
    for a, b, name in zip(want, got, ("rgb", "depth", "acc", "weights")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=1e-5, err_msg=name)


def test_kernel_gradient_check_fails_fast_off_tpu():
    """ADVICE r4: on a CPU backend the on-chip numerics gate must raise a
    clear TPU-only error, not an opaque Mosaic lowering failure (interpret
    mode is structurally blind to the bug class it detects)."""
    import pytest

    from nerf_fewshot_tpu.render.verify import kernel_gradient_check

    with pytest.raises(RuntimeError, match="TPU-only"):
        kernel_gradient_check()
