"""XLA ray-rendering pipeline: sampling → conditioning → MLP → compositing.

This is the jit-compiled reference compute path (the Pallas kernel in
``render/kernels.py`` is the hand-fused fast path, equivalence-tested against
this one). Mirrors the reference's ``render_rays``
(reference: src/training/train.py:188-242): stratified sampling, optional
per-point DINO feature lookup via 3D→2D projection + bilinear sampling,
batched MLP evaluation over the flattened (rays × samples) point set, and
alpha-compositing. Adds first-class hierarchical coarse+fine sampling, which
the reference implements but never wires in
(reference: src/utils/ray_utils.py:86-143, grep-verified unused).

Everything here is shape-static and key-threaded: one compilation per
(n_rays, n_samples) bucket, safe under ``jit``/``pjit``/``shard_map``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.ops.composite import RenderOutputs, volume_render
from nerf_fewshot_tpu.ops.sampling import hierarchical_sample, sample_along_rays

# model_fn(pts (N,3), dirs (N,3), dino (N,D)|None) -> (rgb (N,3), sigma (N,1))
ModelFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]
# point_features_fn(pts (N,3)) -> (N, D) conditioning features
PointFeaturesFn = Callable[[jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Static rendering configuration (hashable → usable as a jit static arg).

    Field sources in the reference config schema (SURVEY.md §5.6):
    near/far (rendering.near/far), n_samples (progressive schedule third
    entry), noise_std / white_bkgd (rendering.*), perturb = training mode,
    n_importance = hierarchical fine samples (0 disables).
    """

    near: float = 2.0
    far: float = 6.0
    n_samples: int = 64
    n_importance: int = 0
    perturb: bool = False
    noise_std: float = 0.0
    white_bkgd: bool = False
    lindisp: bool = False


def _eval_points(
    model_fn: ModelFn,
    pts: jnp.ndarray,  # (R, S, 3)
    rays_d: jnp.ndarray,  # (R, 3)
    point_features_fn: Optional[PointFeaturesFn],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flatten (R, S) points, evaluate the MLP, reshape back.

    The flatten keeps the MLP matmuls as one large (R*S, width) contraction —
    the MXU-friendly layout — instead of a vmap over rays.
    """
    R, S, _ = pts.shape
    pts_flat = pts.reshape(-1, 3)
    # View direction of each sample = its ray's direction
    # (reference: train.py:226 expand + reshape).
    dirs_flat = jnp.broadcast_to(rays_d[:, None, :], (R, S, 3)).reshape(-1, 3)
    dino_flat = point_features_fn(pts_flat) if point_features_fn is not None else None
    rgb_flat, sigma_flat = model_fn(pts_flat, dirs_flat, dino_flat)
    return rgb_flat.reshape(R, S, 3), sigma_flat.reshape(R, S)


def render_rays(
    model_fn: ModelFn,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    key: Optional[jax.Array] = None,
    point_features_fn: Optional[PointFeaturesFn] = None,
    fine_model_fn: Optional[ModelFn] = None,
) -> RenderOutputs:
    """Render a batch of rays.

    Args:
        model_fn: closure over params mapping points (+dirs, +features) to
            (rgb, sigma). For hierarchical rendering this is the coarse model.
        rays_o / rays_d: (R, 3) ray origins / directions.
        settings: static render settings.
        key: PRNG key (enables stratified perturbation + sigma noise); None
            renders deterministically (eval mode).
        point_features_fn: optional per-point conditioning feature lookup
            (DINO projection + bilinear sampling closure).
        fine_model_fn: model for the fine pass; defaults to ``model_fn``
            (shared weights).

    Returns:
        RenderOutputs for the final (fine if hierarchical) pass.
    """
    k_strat = k_noise = k_imp = k_noise2 = None
    if key is not None:
        k_strat, k_noise, k_imp, k_noise2 = jax.random.split(key, 4)

    pts, z_vals = sample_along_rays(
        rays_o,
        rays_d,
        settings.near,
        settings.far,
        settings.n_samples,
        key=k_strat if settings.perturb else None,
        lindisp=settings.lindisp,
    )
    rgb, sigma = _eval_points(model_fn, pts, rays_d, point_features_fn)
    out = volume_render(
        rgb,
        sigma,
        z_vals,
        rays_d,
        noise_std=settings.noise_std,
        key=k_noise,
        white_bkgd=settings.white_bkgd,
    )

    if settings.n_importance <= 0:
        return out

    # Hierarchical fine pass: importance-sample from coarse weights
    # (stop-gradient on the sampling distribution, as in standard NeRF),
    # merge + sort depths, re-evaluate, re-composite.
    weights = jax.lax.stop_gradient(out.weights)
    pts_fine, z_fine = hierarchical_sample(
        rays_o,
        rays_d,
        z_vals,
        weights,
        settings.n_importance,
        key=k_imp if settings.perturb else None,
    )
    fine_fn = fine_model_fn if fine_model_fn is not None else model_fn
    rgb_f, sigma_f = _eval_points(fine_fn, pts_fine, rays_d, point_features_fn)
    return volume_render(
        rgb_f,
        sigma_f,
        z_fine,
        rays_d,
        noise_std=settings.noise_std,
        key=k_noise2,
        white_bkgd=settings.white_bkgd,
    )


def render_image_with(
    ray_render_fn,
    rays_o: jnp.ndarray,  # (H, W, 3)
    rays_d: jnp.ndarray,
    chunk_size: int = 2048,
) -> RenderOutputs:
    """Deterministically render a full image in fixed-size ray chunks using
    any per-ray renderer ``(ro, rd) -> RenderOutputs`` (XLA or fused backend).

    The chunked loop mirrors the reference's memory-bounded eval render
    (reference: src/training/train.py:309-319) but with *static* chunk shapes:
    the flattened H*W rays are padded to a multiple of ``chunk_size`` so a
    single compiled program serves every chunk via ``lax.map``.
    """
    H, W, _ = rays_o.shape
    n = H * W
    ro = rays_o.reshape(-1, 3)
    rd = rays_d.reshape(-1, 3)
    pad = (-n) % chunk_size
    if pad:
        ro = jnp.concatenate([ro, jnp.broadcast_to(ro[-1:], (pad, 3))], axis=0)
        rd = jnp.concatenate([rd, jnp.broadcast_to(rd[-1:], (pad, 3))], axis=0)
    n_chunks = ro.shape[0] // chunk_size
    ro = ro.reshape(n_chunks, chunk_size, 3)
    rd = rd.reshape(n_chunks, chunk_size, 3)

    def chunk_fn(args):
        o, d = args
        return ray_render_fn(o, d)

    outs = jax.lax.map(chunk_fn, (ro, rd))
    return RenderOutputs(
        rgb=outs.rgb.reshape(-1, 3)[:n].reshape(H, W, 3),
        depth=outs.depth.reshape(-1)[:n].reshape(H, W),
        acc=outs.acc.reshape(-1)[:n].reshape(H, W),
        weights=outs.weights.reshape(-1, outs.weights.shape[-1])[:n].reshape(
            H, W, outs.weights.shape[-1]
        ),
    )


def render_image(
    model_fn: ModelFn,
    rays_o: jnp.ndarray,  # (H, W, 3)
    rays_d: jnp.ndarray,
    settings: RenderSettings,
    chunk_size: int = 2048,
    point_features_fn: Optional[PointFeaturesFn] = None,
) -> RenderOutputs:
    """XLA-backend full-image render (see render_image_with)."""

    def ray_fn(o, d):
        return render_rays(
            model_fn, o, d, settings, key=None,
            point_features_fn=point_features_fn,
        )

    return render_image_with(ray_fn, rays_o, rays_d, chunk_size=chunk_size)
