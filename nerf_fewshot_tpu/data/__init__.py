"""Host-side data: Blender-synthetic dataset IO + procedural test scenes."""

from nerf_fewshot_tpu.data.blender import BlenderDataset, load_blender
from nerf_fewshot_tpu.data.synthetic import (
    SyntheticScene,
    make_scene_dataset,
    lego_like_scene,
)

__all__ = [
    "BlenderDataset",
    "load_blender",
    "SyntheticScene",
    "make_scene_dataset",
    "lego_like_scene",
]
