"""Compare TPU kernel and TPU XLA grads against CPU-f32 ground truth.

Run 1: DIAG_CPU=1 -> writes /tmp/diag_gt_cpu.npz (f32 autodiff grads)
Run 2: (no env)   -> computes both TPU paths, compares vs the npz
"""
import os
import numpy as np
import jax

if os.environ.get('DIAG_CPU'):
    jax.config.update('jax_platforms', 'cpu')

import jax.flatten_util
import jax.numpy as jnp

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.render import RenderSettings, render_rays
from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad
from nerf_fewshot_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

R, S = 512, 32
settings = RenderSettings(near=2.0, far=6.0, n_samples=S, perturb=False)
rng = np.random.default_rng(0)
rays_o = jnp.asarray(np.broadcast_to([0.0, 0.0, 4.0], (R, 3)).astype(np.float32))
d = rng.standard_normal((R, 3)).astype(np.float32)
d[:, 2] = -np.abs(d[:, 2]) - 1.0
rays_d = jnp.asarray(d)
target = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
mask = jnp.ones((R,))

model = NeRFMLP(pos_freq=10, dir_freq=4, use_viewdirs=True,
                hidden_dim=256, num_layers=8, sigma_bias_init=0.1)
params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                    jnp.zeros((1, 3)))["params"]


def loss_fn(p):
    def model_fn(pts, dirs, dino):
        return model.apply({"params": p}, pts, dirs)
    out = render_rays(model_fn, rays_o, rays_d, settings)
    return jnp.mean((out.rgb - target) ** 2)


lx, gx = jax.jit(jax.value_and_grad(loss_fn))(params)
flat_x, unravel = jax.flatten_util.ravel_pytree(gx)
flat_x = np.asarray(flat_x, np.float64)

if os.environ.get('DIAG_CPU'):
    np.savez('/tmp/diag_gt_cpu.npz', g=flat_x, loss=float(lx))
    print('cpu ground truth written, loss', float(lx))
    raise SystemExit

lk, gk = jax.jit(lambda p: fused_train_loss_grad(
    p, rays_o, rays_d, target, mask, settings, 10, 4, 8, 256,
    use_viewdirs=True))(params)
flat_k = np.asarray(jax.flatten_util.ravel_pytree(gk)[0], np.float64)

gt = np.load('/tmp/diag_gt_cpu.npz')
g0 = gt['g']
print('loss cpu', float(gt['loss']), 'tpu-xla', float(lx), 'tpu-kernel', float(lk))


def rel(a, b):
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-30)


print('GLOBAL: xla-vs-cpu %.3e  kernel-vs-cpu %.3e  kernel-vs-xla %.3e'
      % (rel(flat_x, g0), rel(flat_k, g0), rel(flat_k, flat_x)))

# per-group breakdown
leaves, treedef = jax.tree_util.tree_flatten_with_path(gx)
off = 0
print(f"{'param':40s} {'|g|cpu':>10s} {'xla':>10s} {'kern':>10s}")
for path, leaf in leaves:
    n = leaf.size
    name = jax.tree_util.keystr(path)
    a = flat_x[off:off+n]; k = flat_k[off:off+n]; c = g0[off:off+n]
    print(f"{name:40s} {np.linalg.norm(c):10.3e} {rel(a,c):10.3e} {rel(k,c):10.3e}")
    off += n
