"""High-level fused rendering: sampling + encoding glue around the Pallas
kernel, mirroring ``render/pipeline.render_rays`` for the functional-stack
NeRFMLP. The fused backend covers every strict-reference training/eval
configuration (the reference never applies sigma noise in its config-driven
path — train.py:236); hierarchical coarse+fine composes as two kernel calls
with the importance sampling in XLA between them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.ops.composite import RenderOutputs
from nerf_fewshot_tpu.ops.encoding import positional_encoding
from nerf_fewshot_tpu.ops.sampling import hierarchical_sample, sample_along_rays
from nerf_fewshot_tpu.render.kernels import (
    _raw_block,
    fused_render,
    fused_render_fwd_pe,
    pack_params,
    pe_layout,
)
from nerf_fewshot_tpu.render.pipeline import RenderSettings


def _pad_lanes(x: jnp.ndarray, multiple: int = 128) -> jnp.ndarray:
    d = x.shape[-1]
    pad = (-d) % multiple
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
    )


def encode_points(
    pts: jnp.ndarray,  # (R, S, 3)
    rays_d: jnp.ndarray,  # (R, 3)
    pos_freq: int,
    dir_freq: int,
    use_viewdirs: bool,
    dino: Optional[jnp.ndarray] = None,  # (R*S, D) per-point features
) -> jnp.ndarray:
    """Build the kernel's padded input block, matching NeRFMLP's input
    concatenation order [PE(pos) | PE(dir) | dino]."""
    R, S, _ = pts.shape
    parts = [positional_encoding(pts.reshape(-1, 3), pos_freq)]
    if use_viewdirs:
        dirs = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3)).reshape(-1, 3)
        parts.append(positional_encoding(dirs, dir_freq))
    if dino is not None:
        parts.append(dino)
    return _pad_lanes(jnp.concatenate(parts, axis=-1))


def fused_render_rays(
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    pos_freq: int,
    dir_freq: int,
    num_layers: int,
    hidden_dim: int,
    use_viewdirs: bool = True,
    lora_alpha: float = 16.0,
    key: Optional[jax.Array] = None,
    point_features_fn=None,
    tile_rays: int = 64,
    interpret: bool = False,
    compute_dtype: str = "float32",
    forward_only: bool = False,
) -> RenderOutputs:
    """Fused-kernel analog of pipeline.render_rays for NeRFMLP params.

    Constraints: noise_std must be 0 (the strict-reference trainer never
    applies it); n_rays must divide by tile_rays.

    ``forward_only``: route through the no-VJP inline-PE forward kernel —
    the positional encoding is built in VMEM and the encoded block never
    exists in HBM. For no-gradient contexts only (eval rendering); the
    result is NOT differentiable w.r.t. params.
    """
    assert settings.noise_std == 0.0, "fused backend: sigma noise unsupported"
    k_strat, k_imp = (None, None)
    if key is not None:
        k_strat, k_imp = jax.random.split(key)

    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    def run(pts, z):
        dino = None
        if point_features_fn is not None:
            dino = point_features_fn(pts.reshape(-1, 3))
        if forward_only:
            feat_dim = 0 if dino is None else dino.shape[-1]
            perm, e2, c, x_dim = pe_layout(
                pos_freq, dir_freq, use_viewdirs, feat_dim
            )
            packed = pack_params(
                params, num_layers, hidden_dim, lora_alpha,
                d_pad=-(-x_dim // 128) * 128, row_perm=perm,
            )
            raw = _raw_block(pts, rays_d, use_viewdirs)
            feats = dino if dino is not None else jnp.zeros(
                (raw.shape[0], 8), raw.dtype
            )
            rgb, depth, acc, weights = fused_render_fwd_pe(
                raw, feats, z, dnorm, jnp.asarray(e2), jnp.asarray(c),
                packed, settings.white_bkgd, tile_rays, interpret,
                compute_dtype, use_feats=dino is not None,
            )
            return RenderOutputs(
                rgb=rgb, depth=depth[:, 0], acc=acc[:, 0], weights=weights
            )
        x = encode_points(pts, rays_d, pos_freq, dir_freq, use_viewdirs, dino)
        # pad width follows the (possibly feature-extended) input dim
        packed = pack_params(
            params, num_layers, hidden_dim, lora_alpha, d_pad=x.shape[-1]
        )
        rgb, depth, acc, weights = fused_render(
            x, z, dnorm, *packed, settings.white_bkgd, tile_rays, interpret,
            compute_dtype,
        )
        return RenderOutputs(
            rgb=rgb, depth=depth[:, 0], acc=acc[:, 0], weights=weights
        )

    pts, z = sample_along_rays(
        rays_o, rays_d, settings.near, settings.far, settings.n_samples,
        key=k_strat if settings.perturb else None, lindisp=settings.lindisp,
    )
    out = run(pts, z)

    if settings.n_importance > 0:
        # Hierarchical coarse+fine: importance-sample in XLA from the coarse
        # kernel's weights, then one more fused pass over the merged samples.
        pts_f, z_f = hierarchical_sample(
            rays_o, rays_d, z, jax.lax.stop_gradient(out.weights),
            settings.n_importance,
            key=k_imp if settings.perturb else None,
        )
        out = run(pts_f, z_f)
    return out
