"""Ray generation and 3D→2D projection.

Single canonical implementations of the ops the reference duplicates
(reference: src/utils/ray_utils.py:4-37 / src/models/ray_sampler.py:4-30 for
ray generation, src/utils/ray_utils.py:176-209 for projection).

Camera model: OpenGL-style pinhole — camera looks down ``-z``, image ``y`` is
flipped (``-(j - H/2)``), ``c2w`` is a 4×4 camera-to-world matrix.

TPU notes: both ops are tiny elementwise/matmul computations that XLA fuses
into their consumers; they are written batch-leading so ``vmap``/``pjit`` can
shard the pixel/point axis.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def get_rays(
    H: int, W: int, focal: float, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate pinhole rays for every pixel of an H×W image.

    Matches the reference formulas (src/utils/ray_utils.py:17-37): pixel grid
    in 'xy' indexing, camera-frame directions
    ``[(i - W/2)/f, -(j - H/2)/f, -1]`` rotated by ``c2w[:3,:3]``, origins
    broadcast from the camera position.

    Returns:
        rays_o: (H, W, 3) ray origins.
        rays_d: (H, W, 3) un-normalized ray directions.
    """
    c2w = jnp.asarray(c2w)
    dtype = c2w.dtype
    i = jnp.arange(W, dtype=dtype)[None, :]  # (1, W) — x/column index
    j = jnp.arange(H, dtype=dtype)[:, None]  # (H, 1) — y/row index
    dirs = jnp.stack(
        [
            jnp.broadcast_to((i - W * 0.5) / focal, (H, W)),
            jnp.broadcast_to(-(j - H * 0.5) / focal, (H, W)),
            -jnp.ones((H, W), dtype=dtype),
        ],
        axis=-1,
    )  # (H, W, 3) camera-frame directions
    # World-frame direction k: sum_c dirs[c] * c2w[k, c]  ==  dirs @ R^T.
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def project_points_to_image(
    points: jnp.ndarray,
    c2w: jnp.ndarray,
    focal: float,
    H: int,
    W: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project world-space 3D points into normalized image coordinates.

    Behavior-parity port of the reference projection
    (src/utils/ray_utils.py:176-209), **including its convention quirk**: the
    reference projects with ``+z`` as the optical axis and no image-space y
    flip, even though its ray generation uses the OpenGL ``-z``-forward
    convention. Points rendered in front of the camera therefore end up with
    ``depth < 0`` and ``valid_mask == False``. The quirk is load-bearing for
    parity with the published DINO-conditioning results, so it is reproduced
    bit-for-bit rather than fixed.

    Args:
        points: (N, 3) world-space points.
        c2w: (4, 4) camera-to-world matrix (inverted internally).
        focal: focal length in pixels.
        H, W: image size.

    Returns:
        points_2d: (N, 2) normalized coords in [-1, 1] for ``grid_sample``.
        depths: (N,) camera-space z.
        valid: (N,) bool, camera-space ``z > 0``.
    """
    w2c = jnp.linalg.inv(c2w)
    ones = jnp.ones_like(points[..., :1])
    homo = jnp.concatenate([points, ones], axis=-1)  # (N, 4)
    cam = homo @ w2c.T  # (N, 4)
    z = cam[..., 2]
    valid = z > 0
    x = cam[..., 0] / (z + 1e-8) * focal + W / 2
    y = cam[..., 1] / (z + 1e-8) * focal + H / 2
    x_norm = (x / W) * 2.0 - 1.0
    y_norm = (y / H) * 2.0 - 1.0
    return jnp.stack([x_norm, y_norm], axis=-1), z, valid


def project_points_script(
    points: jnp.ndarray,
    c2w: jnp.ndarray,
    focal: float,
    H: int,
    W: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The standalone scripts' manual projection — a DIFFERENT convention
    from :func:`project_points_to_image`.

    Behavior-parity port of the inline projection every standalone script
    repeats (reference: src/training/train_lora.py:118-124,
    train_baseline.py:97-103, train_projection.py:114-118,
    train_dino_lora_pose.py:97-102): ``pts_cam = (p - t) @ R.T`` — the
    camera-to-world rotation applied *forward* with no inverse (the correct
    world→camera transform would be ``R.T (p - t)``, i.e. ``(p - t) @ R``),
    ``+z`` optical axis, raw division by z (no epsilon), and **no validity
    mask** — behind-camera points project wherever the math sends them and
    grid_sample's zero padding is the only out-of-bounds handling. For any
    pose with a non-identity rotation this lands on completely different
    feature locations than the proper projection; reproduced bit-for-bit
    because the published standalone-script results depend on it.

    Args:
        points: (N, 3) world-space points.
        c2w: (4, 4) camera-to-world matrix (rotation used FORWARD, unlike
            project_points_to_image).
        focal: focal length in pixels (the scripts pass the full-resolution
            focal even when rendering downsampled rays).
        H, W: image size (the scripts pass full resolution).

    Returns:
        points_2d: (N, 2) normalized coords in [-1, 1] for ``grid_sample``.
        z: (N,) the scripts' pseudo camera-space z (un-negated).
    """
    cam = (points - c2w[:3, 3]) @ c2w[:3, :3].T
    z = cam[..., 2]
    x = cam[..., 0] / z * focal + W / 2
    y = cam[..., 1] / z * focal + H / 2
    x_norm = (x / W) * 2.0 - 1.0
    y_norm = (y / H) * 2.0 - 1.0
    return jnp.stack([x_norm, y_norm], axis=-1), z
