"""Bilinear interpolation ops with torch-compatible semantics.

The reference relies on two torch interpolation primitives whose exact
coordinate conventions are load-bearing for numerical parity:

* ``F.grid_sample(mode='bilinear', padding_mode='zeros')`` for sampling
  projected feature maps (reference: src/models/dino_feature_model.py:135-140
  uses ``align_corners=False``; the standalone scripts, e.g.
  src/training/train_lora.py:128, use ``align_corners=True``). Both are
  supported here via the ``align_corners`` flag.
* ``F.interpolate(mode='bilinear', align_corners=False)`` for progressive
  target down-scaling (reference: src/training/train.py:270) and multi-scale
  feature up/down-sampling (src/models/multi_scale_dino.py:80-85, 131-141).

Both are implemented as gather-based jnp ops (no torch), differentiable, and
shard along the point/pixel axis under ``vmap``/``pjit``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map [-1, 1] normalized coords to pixel coords (torch convention)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    features: jnp.ndarray,
    points: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Sample a feature map at normalized 2D points (torch ``grid_sample``).

    Bilinear, zeros padding: out-of-bounds taps contribute 0, matching
    ``padding_mode='zeros'`` (reference: dino_feature_model.py:135-140).

    Args:
        features: (H, W, C) feature map.
        points: (..., 2) normalized coords in [-1, 1], ordered (x, y) where x
            indexes W and y indexes H — the torch grid convention.
        align_corners: coordinate convention flag (see module docstring).

    Returns:
        sampled: (..., C).
    """
    H, W, C = features.shape
    x = _unnormalize(points[..., 0], W, align_corners)
    y = _unnormalize(points[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0  # weight of x1 tap
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    # TPU: per-point row gathers are catastrophically slow (measured 4 ms
    # for 131K points from a 9×9×64 map — more than an entire fused MLP
    # train step). Every reference feature map is tiny (81-196 patch rows),
    # so build the (..., H·W) bilinear weight matrix instead and sample with
    # ONE MXU matmul; taps clipped onto the same cell sum their weights,
    # which matches the gather formulation. Gather fallback for big maps
    # where the weight matrix would not pay for itself.
    if H * W <= 256:
        cols = jnp.arange(H * W, dtype=jnp.int32)

        def tap_weights(xi, yi, w):
            ix = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
            iy = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
            in_b = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            j = iy * W + ix
            return jnp.where(
                cols == j[..., None], (w * in_b)[..., None], 0.0
            )

        wmat = (
            tap_weights(x0, y0, wx0 * wy0)
            + tap_weights(x1, y0, wx1 * wy0)
            + tap_weights(x0, y1, wx0 * wy1)
            + tap_weights(x1, y1, wx1 * wy1)
        )  # (..., H*W)
        # HIGHEST precision: DEFAULT on TPU truncates matmul inputs to one
        # bf16 pass, silently demoting this gather-equivalent from exact f32
        # to ~1e-3 relative rounding. The contraction is ≤256 wide, so full
        # precision costs nothing measurable.
        return jnp.matmul(
            wmat, features.reshape(H * W, C),
            precision=jax.lax.Precision.HIGHEST,
        )

    def tap(xi, yi):
        ix = xi.astype(jnp.int32)
        iy = yi.astype(jnp.int32)
        in_bounds = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        vals = features[iy, ix]  # (..., C)
        return jnp.where(in_bounds[..., None], vals, 0.0)

    out = (
        tap(x0, y0) * (wx0 * wy0)[..., None]
        + tap(x1, y0) * (wx1 * wy0)[..., None]
        + tap(x0, y1) * (wx0 * wy1)[..., None]
        + tap(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


def resize_bilinear(
    image: jnp.ndarray,
    out_h: int,
    out_w: int,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize an (H, W, C) image (torch ``F.interpolate`` bilinear semantics).

    No antialiasing (torch's default), edge-clamped taps; with
    ``align_corners=False`` the source coordinate is
    ``(dst + 0.5) * (in/out) - 0.5``. Used for progressive-resolution target
    down-scaling (reference: train.py:270) and multi-scale feature alignment.
    """
    H, W, C = image.shape
    dtype = image.dtype

    def src_coords(out_size: int, in_size: int) -> jnp.ndarray:
        d = jnp.arange(out_size, dtype=dtype)
        if align_corners:
            if out_size == 1:
                return jnp.zeros_like(d)
            return d * (in_size - 1) / (out_size - 1)
        scale = in_size / out_size
        return jnp.clip((d + 0.5) * scale - 0.5, 0.0, None)

    ys = src_coords(out_h, H)
    xs = src_coords(out_w, W)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy1 = (ys - y0.astype(dtype))[:, None, None]  # (out_h, 1, 1)
    wx1 = (xs - x0.astype(dtype))[None, :, None]  # (1, out_w, 1)
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    top = image[y0][:, x0] * wx0 + image[y0][:, x1] * wx1
    bot = image[y1][:, x0] * wx0 + image[y1][:, x1] * wx1
    return top * wy0 + bot * wy1
