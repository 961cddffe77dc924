"""flax.linen model stack: NeRF MLPs, LoRA adapters, DINO ViT, fusion heads.

Single canonical module per concept — the reference carries 2-4 duplicated
copies of most of these (SURVEY.md §2 duplication map).
"""

from nerf_fewshot_tpu.models.lora import LoRADense, lora_label_fn, torch_linear_init
from nerf_fewshot_tpu.models.mlp import NeRFMLP, DensityMLP, ColorMLP, NeRFWithDINO
from nerf_fewshot_tpu.models.fusion import NeRFDINOFusion

__all__ = [
    "LoRADense",
    "lora_label_fn",
    "torch_linear_init",
    "NeRFMLP",
    "DensityMLP",
    "ColorMLP",
    "NeRFWithDINO",
    "NeRFDINOFusion",
]
