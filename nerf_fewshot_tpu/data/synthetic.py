"""Procedural synthetic scenes: analytic density/color fields + GT renders.

The reference trains on the Blender-synthetic ``lego`` scene, which is not
redistributable with this repo. This module generates fully self-contained
few-shot datasets of the same shape (N views, poses on an upper-hemisphere
orbit at radius 4, near/far 2/6 — the lego camera rig geometry implied by
experiments/baseline.yaml:12-13 near/far and evaluate.py:306-314 orbit
radius): an analytic scene of colored primitives is volume-rendered at high
sample count with the framework's own (parity-tested) renderer to produce
ground-truth images.

Used by tests (end-to-end training convergence), the benchmark harness, and
as a stand-in dataset for the CLI when no real scene directory exists.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_fewshot_tpu.data.blender import BlenderDataset
from nerf_fewshot_tpu.ops.rays import get_rays
from nerf_fewshot_tpu.render.pipeline import RenderSettings, render_image

# field_fn(pts (N,3)) -> (rgb (N,3), sigma (N,1))
FieldFn = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class SyntheticScene:
    """An analytic radiance field with the lego camera-rig geometry."""

    field_fn: FieldFn
    near: float = 2.0
    far: float = 6.0
    radius: float = 4.0


def _smooth_box(pts, center, half, sharp=30.0):
    """Soft-edged box occupancy in [0, 1] (differentiable, band-limited so
    low-sample-count renders during training can actually fit it)."""
    d = jnp.abs(pts - jnp.asarray(center)) - jnp.asarray(half)
    inside = jax.nn.sigmoid(-sharp * jnp.max(d, axis=-1))
    return inside


def lego_like_scene() -> SyntheticScene:
    """A blocky multi-color scene (stacked slabs + studs) loosely shaped like
    a lego model: strong occlusions, sharp-ish edges, varied albedo."""

    blocks = [
        # (center, half-extent, rgb)
        ((0.0, 0.0, -0.6), (0.9, 0.9, 0.15), (0.85, 0.7, 0.2)),
        ((0.0, 0.0, -0.2), (0.7, 0.5, 0.25), (0.8, 0.15, 0.1)),
        ((-0.2, 0.0, 0.25), (0.45, 0.45, 0.2), (0.1, 0.45, 0.8)),
        ((0.3, 0.3, 0.65), (0.2, 0.2, 0.2), (0.2, 0.7, 0.25)),
        ((-0.45, -0.35, 0.6), (0.15, 0.15, 0.15), (0.9, 0.9, 0.85)),
    ]

    def field_fn(pts):
        sigma = jnp.zeros(pts.shape[:-1])
        rgb = jnp.zeros(pts.shape[:-1] + (3,))
        for center, half, color in blocks:
            occ = _smooth_box(pts, center, half)
            sigma = sigma + 25.0 * occ
            rgb = rgb + occ[..., None] * jnp.asarray(color)
        denom = jnp.maximum(sigma / 25.0, 1e-6)[..., None]
        rgb = jnp.clip(rgb / denom, 0.0, 1.0)
        return rgb, sigma[..., None]

    return SyntheticScene(field_fn=field_fn)


def orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    """OpenGL camera-to-world on a sphere looking at the origin.

    theta: azimuth (rad), phi: elevation above the xy-plane (rad).
    Convention matches Blender-synthetic rigs: camera -z axis points at the
    origin, +x is screen-right, +y screen-up.
    """
    eye = radius * np.array(
        [np.cos(phi) * np.cos(theta), np.cos(phi) * np.sin(theta), np.sin(phi)]
    )
    forward = -eye / np.linalg.norm(eye)  # toward origin
    world_up = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, world_up)
    nr = np.linalg.norm(right)
    if nr < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
        nr = 1.0
    right = right / nr
    up = np.cross(right, forward)
    c2w = np.eye(4, dtype=np.float32)
    # OpenGL camera: columns = (x=right, y=up, z=backward)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w


def make_scene_dataset(
    scene: SyntheticScene,
    n_views: int,
    img_size: int = 64,
    gt_samples: int = 256,
    seed: int = 0,
    split: str = "train",
) -> BlenderDataset:
    """Render ground-truth views of a synthetic scene.

    Poses are spread over the upper hemisphere (deterministic per seed+split
    so train/test rigs differ). GT images use a high stratified sample count
    with the deterministic renderer.
    """
    rng = np.random.default_rng(seed + (0 if split == "train" else 1000))
    camera_angle_x = 0.6911  # lego's FOV (~39.6°)
    focal = 0.5 * img_size / np.tan(0.5 * camera_angle_x)

    thetas = rng.uniform(0, 2 * np.pi, n_views)
    phis = rng.uniform(np.deg2rad(15), np.deg2rad(55), n_views)
    poses = np.stack([orbit_pose(t, p, scene.radius) for t, p in zip(thetas, phis)])

    settings = RenderSettings(
        near=scene.near, far=scene.far, n_samples=gt_samples, white_bkgd=True
    )

    def model_fn(pts, dirs, feats):
        return scene.field_fn(pts)

    import jax

    @jax.jit  # trace once, reuse across all poses (compiles are expensive)
    def render_pose(pose):
        rays_o, rays_d = get_rays(img_size, img_size, focal, pose)
        out = render_image(
            model_fn, rays_o, rays_d, settings, chunk_size=img_size * img_size
        )
        return out.rgb

    images = []
    for pose in poses:
        images.append(np.asarray(render_pose(jnp.asarray(pose))))
    return BlenderDataset(
        images=np.clip(np.stack(images), 0.0, 1.0),
        poses=poses.astype(np.float32),
        H=img_size,
        W=img_size,
        focal=float(focal),
    )
