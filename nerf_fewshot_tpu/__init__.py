"""nerf_fewshot_tpu — a TPU-native few-shot NeRF framework (JAX/XLA/Pallas/pjit).

Re-implements, TPU-first, the capabilities of the reference PyTorch repo
`ANKITSANJYAL/nerf-few-shot-limitations` (few-shot NeRF on Blender-synthetic
scenes with optional DINO/ViT feature conditioning: frozen, LoRA-adapted and
multi-scale fused variants).

Layering (bottom-up):
  ops/       pure functional jnp ops (rays, sampling, encoding, compositing,
             bilinear interpolation) — single canonical implementation of each
             op the reference duplicates across files.
  models/    flax.linen modules: NeRF MLPs, LoRA adapters, DINO ViT backbone,
             fusion heads, multi-scale feature extractors.
  render/    the fused hot path: XLA renderer + Pallas ray-tile kernels.
  parallel/  device mesh, sharding specs, pjit train-step wrappers,
             multi-host initialization, scaling benchmarks.
  data/      Blender dataset loader + procedural synthetic scenes.
  training/  config tree, trainer engine, losses, metrics, checkpointing.
"""

__version__ = "0.1.0"

# Convenience re-exports (import cost is deferred to first attribute access
# via PEP 562 would be overkill here; these are light modules).
from nerf_fewshot_tpu.training.config import Config, load_config  # noqa: E402,F401
from nerf_fewshot_tpu.training.trainer import Trainer  # noqa: E402,F401
from nerf_fewshot_tpu.render.pipeline import (  # noqa: E402,F401
    RenderSettings,
    render_rays,
    render_image,
)
