"""Point sampling along rays: stratified and hierarchical (importance).

Canonical implementations of the reference's samplers
(reference: src/utils/ray_utils.py:39-84 stratified with lindisp,
src/models/ray_sampler.py:32-61 stratified (H,W) variant,
src/utils/ray_utils.py:86-143 inverse-CDF hierarchical sampling).

All functions take explicit PRNG keys (``key=None`` means deterministic /
no-perturb) and keep every shape static so they compile once per
(N_rays, N_samples) bucket.

TPU notes: the inverse-CDF ``searchsorted`` is implemented as a dense
comparison-matrix reduction over the (small, 33-65 entry) CDF axis instead of
a sequential binary search — an O(N_importance × N_bins) VPU-friendly
formulation with no gather-dependent control flow.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_along_rays(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    key: Optional[jax.Array] = None,
    lindisp: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stratified sampling of ``n_samples`` depths per ray.

    Matches reference math (src/utils/ray_utils.py:56-82): linear in depth
    (or in inverse depth for ``lindisp``), and when ``key`` is given, uniform
    jitter within the mid-point bins.

    Args:
        rays_o, rays_d: (..., 3) ray origins / directions (any leading dims).
        key: PRNG key enabling perturbation, or None for deterministic.

    Returns:
        pts: (..., n_samples, 3) world-space sample points.
        z_vals: (..., n_samples) depths.
    """
    dtype = rays_o.dtype
    batch_shape = rays_o.shape[:-1]
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    if lindisp:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z = near * (1.0 - t) + far * t
    z_vals = jnp.broadcast_to(z, batch_shape + (n_samples,))

    if key is not None:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * u

    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return pts, z_vals


def _searchsorted_right(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Batched ``searchsorted(..., right=True)``.

    ``cdf``: (..., B) non-decreasing; ``u``: (..., N). Returns (..., N) int32
    indices = number of cdf entries <= u. Dense comparison reduction (VPU)
    rather than per-element binary search — B is at most ~129 here.
    """
    return jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )


def sample_pdf(
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF importance sampling of new depths from coarse weights.

    Matches the reference hierarchical sampler's core
    (src/utils/ray_utils.py:104-135): +1e-5 weight floor, CDF with a leading
    zero, right-searchsorted uniforms, below/above clamping, and linear
    interpolation between the bracketing z bins with a <1e-5 denominator
    guard. Note the reference interprets ``z_vals`` themselves as the CDF bin
    edges (not bin midpoints).

    Args:
        z_vals: (R, S) coarse depths.
        weights: (R, S) coarse compositing weights.
        key: PRNG key for random uniforms; None → evenly spaced u.

    Returns:
        samples: (R, n_importance) new depths (unsorted).
    """
    dtype = z_vals.dtype
    R, S = z_vals.shape
    w = weights + 1e-5
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (R, S+1)

    if key is not None:
        u = jax.random.uniform(key, (R, n_importance), dtype=dtype)
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_importance, dtype=dtype), (R, n_importance)
        )

    # Gather-free bracketing. Per-row ``take_along_axis`` lowers to a slow
    # generic gather on TPU (measured ~20 ms/step at R=2048, Ni=128 — it
    # dominated the whole hierarchical step); instead every bracket value is
    # a masked reduction over ONE broadcast compare matrix, which XLA fuses
    # into vectorized compare+select+reduce passes (~60× faster).
    #
    # Correctness relies on monotonicity: the +1e-5 floor makes the pdf
    # strictly positive, so ``cdf`` is strictly increasing, and ``z_vals``
    # is ascending. With idx = #{cdf <= u} (searchsorted-right):
    #   cdf[idx-1] = largest cdf entry <= u   (idx >= 1 always: cdf[0]=0)
    #   cdf[idx]   = smallest entry > u; when none (u >= 1.0, the linspace
    #                endpoint) the reference clamps to cdf[S]
    #   z[min(idx-1, S-1)] = largest z whose column satisfies cdf <= u
    #   z[min(idx,   S-1)] = smallest z whose column has cdf > u, else z[S-1]
    # — exactly the reference's clamped gathers (ray_utils.py:117-131).
    big = jnp.asarray(jnp.inf, dtype)
    le = cdf[..., None, :] <= u[..., :, None]  # (R, Ni, S+1)
    cdf_b = cdf[..., None, :]
    cdf_below = jnp.max(jnp.where(le, cdf_b, -big), axis=-1)
    cdf_above = jnp.min(jnp.where(le, big, cdf_b), axis=-1)
    cdf_above = jnp.where(
        jnp.isfinite(cdf_above), cdf_above, cdf[..., -1:]
    )
    le_z = le[..., :S]  # z_vals has S entries (columns 0..S-1)
    z_b = z_vals[..., None, :]
    bins_below = jnp.max(jnp.where(le_z, z_b, -big), axis=-1)
    bins_above = jnp.min(jnp.where(le_z, big, z_b), axis=-1)
    bins_above = jnp.where(
        jnp.isfinite(bins_above), bins_above, z_vals[..., -1:]
    )

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def hierarchical_sample(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse+fine hierarchical sampling (src/utils/ray_utils.py:86-143).

    Draws ``n_importance`` importance samples from the coarse weights, merges
    them with the coarse depths by sorting, and returns the combined points.

    Returns:
        pts: (R, S + n_importance, 3) combined sample points.
        z_combined: (R, S + n_importance) sorted combined depths.
    """
    samples = sample_pdf(z_vals, weights, n_importance, key=key)
    z_combined = jnp.sort(jnp.concatenate([z_vals, samples], axis=-1), axis=-1)
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_combined[..., :, None]
    return pts, z_combined
