"""The render hot path: XLA pipeline + fused Pallas ray-tile kernels."""

from nerf_fewshot_tpu.render.pipeline import RenderSettings, render_rays, render_image

__all__ = ["RenderSettings", "render_rays", "render_image"]
