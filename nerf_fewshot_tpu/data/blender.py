"""Blender-synthetic (NeRF paper format) dataset loading.

Host-side numpy IO matching the reference loader's semantics
(reference: src/models/data_loader.py:8-64): parse
``transforms_{split}.json``, load PNGs, LANCZOS-resize to ``img_size``
(or half resolution), scale the focal length accordingly, and compute
``focal = 0.5 * W / tan(camera_angle_x / 2) * scale``.

Differences from the reference, by design:
* Images come back channel-last float32 (H, W, C) numpy — the layout the
  jnp pipeline consumes directly (the reference returns CHW torch tensors it
  immediately permutes back; train.py:148).
* RGBA is preserved when present so the trainer can do the reference's
  white-composite (reference: train.py:181-185); plain RGB loads get an
  implicit alpha of 1.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

try:  # PIL ships with torchvision in this image
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


@dataclasses.dataclass
class BlenderDataset:
    """A loaded split: images (N, H, W, 3or4) float32 in [0,1], poses
    (N, 4, 4) float32 camera-to-world, and intrinsics."""

    images: np.ndarray
    poses: np.ndarray
    H: int
    W: int
    focal: float

    @property
    def n_views(self) -> int:
        return self.images.shape[0]

    def white_composited(self) -> np.ndarray:
        """RGBA → RGB over white (reference: train.py:181-185); RGB passes
        through unchanged. Runs through the native C++ host op when built
        (native/nerf_native.cpp, numpy fallback otherwise; parity pinned by
        tests/test_native.py)."""
        if self.images.shape[-1] == 3:
            return self.images
        from nerf_fewshot_tpu import native

        return native.composite_white(self.images)

    def few_shot(self, num_views: int) -> "BlenderDataset":
        """First-k few-shot view slice (reference: train.py:141-143)."""
        return dataclasses.replace(
            self, images=self.images[:num_views], poses=self.poses[:num_views]
        )


def load_blender(
    basedir: str,
    split: str = "train",
    img_size: Optional[int] = None,
    half_res: bool = False,
    keep_alpha: bool = True,
    focal_convention: str = "reference",
) -> BlenderDataset:
    """Load one split of a Blender-synthetic scene directory.

    ``focal_convention``:
      * ``'reference'`` (default) — reproduce the reference's focal formula
        bit-for-bit (data_loader.py:62): ``0.5 * W_resized / tan(cax/2) *
        focal_scale``. Because ``W_resized`` already includes the resize, the
        scale is applied **twice** — a reference bug that widens the effective
        FOV and is load-bearing for PSNR parity with the published numbers.
      * ``'physical'`` — the correct pinhole focal for the resized image,
        ``0.5 * W_resized / tan(cax/2)``.
    """
    if Image is None:  # pragma: no cover
        raise ImportError("PIL is required for Blender dataset loading")

    with open(os.path.join(basedir, f"transforms_{split}.json")) as f:
        meta = json.load(f)

    images, poses = [], []
    for frame in meta["frames"]:
        img_path = os.path.join(basedir, frame["file_path"] + ".png")
        if not os.path.exists(img_path):
            raise FileNotFoundError(f"Image not found: {img_path}")
        img = Image.open(img_path)
        img = img.convert("RGBA" if keep_alpha and "A" in img.getbands() else "RGB")
        W_orig, _ = img.size

        if img_size:
            resize = (img_size, img_size)
            focal_scale = img_size / W_orig
        elif half_res:
            resize = (img.size[0] // 2, img.size[1] // 2)
            focal_scale = 0.5
        else:
            resize = None
            focal_scale = 1.0
        if resize is not None and resize != img.size:
            img = img.resize(resize, Image.LANCZOS)

        images.append(np.asarray(img, dtype=np.float32) / 255.0)
        poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))

    images_np = np.stack(images)
    poses_np = np.stack(poses)
    H, W = images_np.shape[1:3]
    focal = 0.5 * W / np.tan(0.5 * meta["camera_angle_x"])
    if focal_convention == "reference":
        focal *= focal_scale
    return BlenderDataset(
        images=images_np, poses=poses_np, H=H, W=W, focal=float(focal)
    )


def save_blender(
    basedir: str,
    split: str,
    images: np.ndarray,
    poses: np.ndarray,
    camera_angle_x: float,
) -> None:
    """Write a dataset in Blender-synthetic layout (round-trip for tests)."""
    if Image is None:  # pragma: no cover
        raise ImportError("PIL is required")
    os.makedirs(os.path.join(basedir, split), exist_ok=True)
    frames = []
    for i, (img, pose) in enumerate(zip(images, poses)):
        rel = f"./{split}/r_{i}"
        arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(basedir, f"{rel}.png"))
        frames.append(
            {"file_path": rel, "transform_matrix": np.asarray(pose).tolist()}
        )
    with open(os.path.join(basedir, f"transforms_{split}.json"), "w") as f:
        json.dump({"camera_angle_x": camera_angle_x, "frames": frames}, f)
