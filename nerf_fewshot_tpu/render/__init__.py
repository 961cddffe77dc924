"""The render hot path: XLA pipeline + fused Pallas ray-tile kernels."""

from nerf_fewshot_tpu.render.pipeline import (
    RenderSettings,
    render_rays,
    render_image,
    render_image_with,
)
from nerf_fewshot_tpu.render.fused import fused_render_rays
from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad

__all__ = [
    "RenderSettings",
    "render_rays",
    "render_image",
    "render_image_with",
    "fused_render_rays",
    "fused_train_loss_grad",
]
