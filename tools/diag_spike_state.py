"""On-chip A/B at the pre-spike training state: fused kernel vs XLA
loss+gradients on the REAL script_baseline pipeline inputs, with params
loaded from a checkpoint trained to the epoch where the recipe's knife-edge
instability begins (epochs 0-4 losses are path-identical; epoch 5 resolves
as recovery on CPU-f32/XLA-TPU but collapse on the kernel path).

Usage:
  NERF_TPU_PLATFORM=cpu ... --epochs 5 train -> /tmp/diag_sb5/final.ckpt
  python tools/diag_spike_state.py [ckpt]       (on the chip)
  DIAG_CPU=1 python tools/diag_spike_state.py   (interpret-mode sanity)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get('DIAG_CPU'):
    jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.flatten_util
import jax.numpy as jnp

from nerf_fewshot_tpu.training.config import load_config
from nerf_fewshot_tpu.training.trainer import Trainer, _feature_sampler
from nerf_fewshot_tpu.cli import _load_datasets, _precompute_features
from nerf_fewshot_tpu.render import RenderSettings, render_rays
from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad
from nerf_fewshot_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

CKPT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/diag_sb5/final.ckpt'

cfg = load_config('experiments/script_baseline.yaml')
train_data, test_data = _load_datasets(cfg, True)
feats = _precompute_features(cfg, train_data)
tr = Trainer(cfg, train_data, test_data, dino_features=feats,
             log_path='/tmp/diag_spike_log.jsonl')
tr.load(CKPT)
print('loaded', CKPT, 'at epoch', tr.epoch, flush=True)

phase = cfg.phase_for_epoch(tr.epoch)
H = W = phase.H
from nerf_fewshot_tpu.ops.rays import get_rays

focal_full = tr.focal
focal = focal_full if not cfg.focal_scaling else focal_full * H / tr.H
settings = RenderSettings(near=cfg.rendering.near, far=cfg.rendering.far,
                          n_samples=phase.n_samples, perturb=False)
POS_FREQ, DIR_FREQ = cfg.nerf.pos_freq, cfg.nerf.dir_freq
NL, HD = cfg.nerf.num_layers, cfg.nerf.hidden_dim
UV = cfg.nerf.use_viewdirs

for view in range(len(tr.poses)):
    rays_o, rays_d = get_rays(H, W, focal, tr.poses[view])
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    target = jax.image.resize(
        tr.targets_full[view], (H, W, 3), 'linear'
    ).reshape(-1, 3)
    R = rays_o.shape[0]
    mask = jnp.ones((R,))
    pf = _feature_sampler(tr.dino_features[view], tr.poses[view], focal_full,
                          tr.H, tr.W, align_corners=cfg.dino.align_corners,
                          invalid_fill=cfg.dino.invalid_fill,
                          projection=cfg.dino.projection)

    # DIAG_COMPUTE=highest runs the kernel in exact-f32 dot mode (the
    # round-5 compute_dtype option) — on chip its gradients should land at
    # CPU-f32-truth distance ~1e-6 instead of the bf16 paths' 1e-2..4e-1.
    compute = os.environ.get('DIAG_COMPUTE', 'float32')
    lk, gk = jax.jit(lambda p: fused_train_loss_grad(
        p, rays_o, rays_d, target, mask, settings, POS_FREQ, DIR_FREQ,
        NL, HD, use_viewdirs=UV, point_features_fn=pf,
        compute_dtype=compute,
        interpret=bool(os.environ.get('DIAG_CPU'))))(tr.params)

    # dW-accumulation-HIGHEST variant (VERDICT r4 item 4a): isolates whether
    # the residual spike-state kernel-vs-XLA gap lives in the bf16-truncated
    # activationsᵀ@deltas dW dots.
    lh, gh = jax.jit(lambda p: fused_train_loss_grad(
        p, rays_o, rays_d, target, mask, settings, POS_FREQ, DIR_FREQ,
        NL, HD, use_viewdirs=UV, point_features_fn=pf,
        dw_precision='highest',
        interpret=bool(os.environ.get('DIAG_CPU'))))(tr.params)

    def loss_fn(p):
        def model_fn(pts, dirs, dino):
            return tr.model.apply({"params": p}, pts, dirs, dino)
        out = render_rays(model_fn, rays_o, rays_d, settings,
                          point_features_fn=pf)
        return jnp.mean((out.rgb - target) ** 2)

    lx, gx = jax.jit(jax.value_and_grad(loss_fn))(tr.params)
    fk = np.asarray(jax.flatten_util.ravel_pytree(gk)[0], np.float64)
    fh = np.asarray(jax.flatten_util.ravel_pytree(gh)[0], np.float64)
    fx = np.asarray(jax.flatten_util.ravel_pytree(gx)[0], np.float64)
    rel = np.linalg.norm(fk - fx) / max(np.linalg.norm(fx), 1e-30)
    rel_h = np.linalg.norm(fh - fx) / max(np.linalg.norm(fx), 1e-30)
    # per-head breakdown
    def head_rel(g, name):
        a = np.asarray(jax.flatten_util.ravel_pytree(g[name])[0], np.float64)
        b = np.asarray(jax.flatten_util.ravel_pytree(gx[name])[0], np.float64)
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
    print(f"view {view}: loss_k={float(lk):.6f} loss_x={float(lx):.6f} "
          f"grad_rel={rel:.3e} grad_rel_dwHIGHEST={rel_h:.3e} "
          f"sigma_head={head_rel(gk, 'sigma_head'):.3e}"
          f"->{head_rel(gh, 'sigma_head'):.3e} "
          f"rgb_head={head_rel(gk, 'rgb_head'):.3e}"
          f"->{head_rel(gh, 'rgb_head'):.3e}", flush=True)

    # DIAG_SAVE=<prefix>: dump the flattened gradient vectors so runs on
    # different platforms can be cross-compared against CPU-f32 truth
    # (e.g. TPU kernel vs TPU XLA vs CPU-XLA — are both on-chip paths
    # equidistant from the exact-f32 result, or is one directionally off?)
    save = os.environ.get('DIAG_SAVE')
    if save:
        np.savez(f"{save}_view{view}.npz", kernel=fk, kernel_dwh=fh, xla=fx,
                 loss_k=float(lk), loss_x=float(lx))
