"""Training engine: typed config tree, losses, metrics, optimizer, trainer."""

from nerf_fewshot_tpu.training.config import Config, load_config
from nerf_fewshot_tpu.training.losses import nerf_loss
from nerf_fewshot_tpu.training.metrics import psnr, ssim
from nerf_fewshot_tpu.training.trainer import Trainer

__all__ = ["Config", "load_config", "nerf_loss", "psnr", "ssim", "Trainer"]
