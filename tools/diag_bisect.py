"""On-chip bisect: fused kernel vs XLA autodiff across feature dims."""
import numpy as np
import jax
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

for use_vd in (False, True):
    for feat_dim in (0, 64, 128, 256, 768):
        model = NeRFMLP(pos_freq=10, dir_freq=4, use_viewdirs=use_vd,
                        hidden_dim=256, num_layers=8,
                        dino_dim=feat_dim, sigma_bias_init=0.1)
        if feat_dim:
            params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                                jnp.zeros((1, 3)), jnp.zeros((1, feat_dim)))["params"]
            fmat = jnp.asarray(
                rng.standard_normal((feat_dim, 3)).astype(np.float32) * 0.3)
            pf = lambda pts, fmat=fmat: jnp.tanh(pts @ fmat.T)
        else:
            params = model.init(jax.random.key(0), jnp.zeros((1, 3)),
                                jnp.zeros((1, 3)))["params"]
            pf = None

        lk, gk = jax.jit(lambda p: fused_train_loss_grad(
            p, rays_o, rays_d, target, mask, settings, 10, 4, 8, 256,
            use_viewdirs=use_vd, point_features_fn=pf))(params)

        def loss_fn(p):
            def model_fn(pts, dirs, dino):
                return model.apply({"params": p}, pts, dirs, dino)
            out = render_rays(model_fn, rays_o, rays_d, settings,
                              point_features_fn=pf)
            return jnp.mean((out.rgb - target) ** 2)
        lx, gx = jax.jit(jax.value_and_grad(loss_fn))(params)

        fk = np.asarray(jax.flatten_util.ravel_pytree(gk)[0])
        fx = np.asarray(jax.flatten_util.ravel_pytree(gx)[0])
        rel = np.linalg.norm(fk - fx) / (np.linalg.norm(fx) + 1e-12)
        print(f"vd={int(use_vd)} feat={feat_dim:4d}: "
              f"loss k={float(lk):.6f} x={float(lx):.6f} "
              f"dl={abs(float(lk)-float(lx)):.2e} gdiff={rel:.3e}",
              flush=True)
