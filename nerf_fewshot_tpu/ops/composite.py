"""Alpha-compositing volume rendering.

Canonical implementation of the reference's two duplicated renderers
(reference: src/models/nerf_mlp.py:160-215 module variant returning
rgb/depth/weights with noise + white background, and
src/models/volume_renderer.py:4-43 functional rgb-only variant). Exact
constants preserved: ``1e10`` far-plane delta, ``1e-10`` transmittance
epsilon, ReLU on (optionally noised) density, distances scaled by
``||rays_d||``.

TPU notes: the transmittance is an exclusive cumulative product along the
(short, 32-128 entry) sample axis — XLA lowers ``jnp.cumprod`` to a log-depth
scan that stays in registers/VMEM; inside the Pallas ray-tile kernel the same
math runs on the tile resident in VMEM so the (rays × samples) field never
spills to HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray  # (..., 3) composited color
    depth: jnp.ndarray  # (...,) expected depth
    acc: jnp.ndarray  # (...,) accumulated opacity
    weights: jnp.ndarray  # (..., S) per-sample compositing weights


def compute_weights(
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-sample compositing weights ``w_i = alpha_i * T_i``.

    Matches reference math (src/models/nerf_mlp.py:185-205):
      dists_i = (z_{i+1} - z_i, ..., 1e10) * ||rays_d||
      alpha_i = 1 - exp(-relu(sigma_i [+ noise]) * dists_i)
      T_i     = prod_{j<i} (1 - alpha_j + 1e-10)        (exclusive)

    Args:
        sigma: (..., S) raw density.
        z_vals: (..., S) sample depths.
        rays_d: (..., 3) un-normalized ray directions.
        noise_std: Gaussian sigma-noise std (training regularizer); applied
            only when ``key`` is not None.

    Returns:
        weights: (..., S).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if noise_std > 0.0 and key is not None:
        sigma = sigma + noise_std * jax.random.normal(key, sigma.shape, sigma.dtype)

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    return alpha * trans


def composite_rays(
    weights: jnp.ndarray,
    rgb: jnp.ndarray,
    z_vals: jnp.ndarray,
    white_bkgd: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-sample colors into pixel rgb/depth/acc.

    Matches reference (src/models/nerf_mlp.py:204-215): rgb = Σ w·c,
    depth = Σ w·z, optional white background ``rgb + (1 - acc)``.
    """
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map)[..., None]
    return rgb_map, depth_map, acc_map


def volume_render(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    noise_std: float = 0.0,
    key: Optional[jax.Array] = None,
    white_bkgd: bool = False,
) -> RenderOutputs:
    """Full volume-rendering equation: weights + compositing in one call.

    Args:
        rgb: (..., S, 3) per-sample colors in [0, 1].
        sigma: (..., S) raw densities.
        z_vals: (..., S) depths; rays_d: (..., 3).

    Returns:
        RenderOutputs(rgb (...,3), depth (...), acc (...), weights (...,S)).
    """
    weights = compute_weights(sigma, z_vals, rays_d, noise_std=noise_std, key=key)
    rgb_map, depth_map, acc_map = composite_rays(
        weights, rgb, z_vals, white_bkgd=white_bkgd
    )
    return RenderOutputs(rgb=rgb_map, depth=depth_map, acc=acc_map, weights=weights)
