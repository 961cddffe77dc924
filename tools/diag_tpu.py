"""On-chip A/B: fused train kernel vs XLA autodiff on script-projection
feature-conditioned inputs (the config class that collapses on TPU)."""
import os

import jax

# Platform switch must happen before any computation/compile-cache setup
# (sitecustomize pre-imports jax pinned to the remote TPU; jax.config wins
# only while nothing has executed yet — see CLAUDE.md).
if os.environ.get('DIAG_CPU'):
    jax.config.update('jax_platforms', 'cpu')

import dataclasses
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

cfg = load_config('experiments/script_baseline.yaml')
train_data, test_data = _load_datasets(cfg, True)
feats = _precompute_features(cfg, train_data)
print('feats finite:', bool(np.isfinite(np.asarray(feats)).all()),
      'min/max', float(np.min(feats)), float(np.max(feats)))

tr = Trainer(cfg, train_data, test_data, dino_features=feats,
             log_path='/tmp/diag_tpu_log.jsonl')

phase = cfg.phase_for_epoch(0)
H = W = phase.H
from nerf_fewshot_tpu.ops.rays import get_rays
focal_full = tr.focal
focal = focal_full if not cfg.focal_scaling else focal_full * H / tr.H
rays_o, rays_d = get_rays(H, W, focal, tr.poses[0])
rays_o = rays_o.reshape(-1, 3)
rays_d = rays_d.reshape(-1, 3)
target = jax.image.resize(tr.targets_full[0], (H, W, 3), 'linear').reshape(-1, 3)
R = rays_o.shape[0]
mask = jnp.ones((R,))

pf = _feature_sampler(tr.dino_features[0], tr.poses[0], focal_full,
                      tr.H, tr.W, align_corners=cfg.dino.align_corners,
                      invalid_fill=cfg.dino.invalid_fill,
                      projection=cfg.dino.projection)

# feature stats at the actual sample points
from nerf_fewshot_tpu.ops.sampling import sample_along_rays
settings = RenderSettings(near=cfg.rendering.near, far=cfg.rendering.far,
                          n_samples=phase.n_samples, perturb=False)
key = jax.random.key(0)
pts, z = sample_along_rays(rays_o, rays_d, settings.near, settings.far,
                           settings.n_samples, key=key)
f = pf(pts.reshape(-1, 3))
fa = np.asarray(f)
print('sampled feats finite:', bool(np.isfinite(fa).all()),
      'min/max', fa.min(), fa.max(), 'frac nonzero', (fa != 0).mean())

params = tr.params
model = tr.model

POS_FREQ, DIR_FREQ = cfg.nerf.pos_freq, cfg.nerf.dir_freq
NL, HD = cfg.nerf.num_layers, cfg.nerf.hidden_dim
UV = cfg.nerf.use_viewdirs

@jax.jit
def kernel_lg(params, key):
    return fused_train_loss_grad(
        params, rays_o, rays_d, target, mask, settings,
        POS_FREQ, DIR_FREQ, NL, HD, use_viewdirs=UV,
        key=key, point_features_fn=pf,
        interpret=bool(__import__('os').environ.get('DIAG_CPU')))

@jax.jit
def xla_lg(params, key):
    def loss_fn(p):
        def model_fn(pts, dirs, dino):
            return model.apply({"params": p}, pts, dirs, dino)
        out = render_rays(model_fn, rays_o, rays_d, settings, key=key,
                          point_features_fn=pf)
        return jnp.mean((out.rgb - target) ** 2)
    return jax.value_and_grad(loss_fn)(params)

lk, gk = kernel_lg(params, None)
lx, gx = xla_lg(params, None)
print('loss kernel', float(lk), 'loss xla', float(lx))

fk = jax.flatten_util.ravel_pytree(gk)[0]
fx = jax.flatten_util.ravel_pytree(gx)[0]
fk = np.asarray(fk); fx = np.asarray(fx)
print('grad finite kernel/xla:', np.isfinite(fk).all(), np.isfinite(fx).all())
print('grad norm kernel', np.linalg.norm(fk), 'xla', np.linalg.norm(fx))
den = np.linalg.norm(fx) + 1e-12
print('rel grad diff', np.linalg.norm(fk - fx) / den)
# cosine
print('cosine', float((fk @ fx) / ((np.linalg.norm(fk) * np.linalg.norm(fx)) + 1e-12)))
