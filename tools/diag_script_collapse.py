"""On-chip A/B: fused train kernel vs XLA autodiff gradients across the
config axes that separate the surviving runs from the round-4 script_*
collapses (kernel died at PSNR 1.84; XLA-on-TPU and CPU-f32 both recovered
from the same epoch-3..5 instability on identical configs/seeds).

Axes probed: per-point features (script recipes) vs none, viewdirs on/off,
live (0.1) vs saturated (5.0) sigma bias — saturation drives transmittances
to the 1e-10 epsilon floor, the `s_after/om` cancellation regime — and
inline-PE vs precomputed-PE kernels (inline PE bf16-truncates raw positions
in its phase matmul; the top PE frequency bands see O(radian) phase error).

Run on the real chip: python tools/diag_script_collapse.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_CPU"):
    # CPU validation of the probe itself (interpret-mode kernels; cannot see
    # Mosaic precision effects — only the real chip can)
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.flatten_util
import jax.numpy as jnp

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.render import RenderSettings, render_rays
from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad
from nerf_fewshot_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

R, S, H, L = 256, 16, 128, 3


def probe(tag, pos_freq, dir_freq, use_viewdirs, feat_dim, sigma_bias,
          inline_pe=True):
    model = NeRFMLP(pos_freq=pos_freq, dir_freq=dir_freq,
                    use_viewdirs=use_viewdirs, hidden_dim=H, num_layers=L,
                    dino_dim=feat_dim, sigma_bias_init=sigma_bias)
    init_args = [jax.random.key(0), jnp.zeros((1, 3))]
    init_args.append(jnp.zeros((1, 3)) if use_viewdirs else None)
    if feat_dim:
        init_args.append(jnp.zeros((1, feat_dim)))
    params = model.init(*init_args)["params"]

    rng = np.random.default_rng(0)
    ro = jnp.asarray(np.broadcast_to([0., 0., 4.], (R, 3)).astype(np.float32))
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    rd = jnp.asarray(d)
    tgt = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
    mask = jnp.ones((R,))
    settings = RenderSettings(near=2.0, far=6.0, n_samples=S, perturb=False)

    pf = None
    if feat_dim:
        W = jnp.asarray(
            rng.standard_normal((3, feat_dim)).astype(np.float32) * 0.5
        )

        def pf(pts):
            return jnp.tanh(pts @ W)

    interpret = bool(os.environ.get("DIAG_CPU"))
    loss_k, grads_k = jax.jit(lambda p: fused_train_loss_grad(
        p, ro, rd, tgt, mask, settings, pos_freq, dir_freq, L, H,
        use_viewdirs=use_viewdirs, point_features_fn=pf,
        inline_pe=inline_pe, interpret=interpret,
    ))(params)

    def loss_fn(p):
        def mf(pts, dirs, dino):
            if use_viewdirs:
                return model.apply({"params": p}, pts, dirs, dino)
            return model.apply({"params": p}, pts, None, dino)

        out = render_rays(mf, ro, rd, settings,
                          point_features_fn=pf)
        return jnp.mean((out.rgb - tgt) ** 2)

    loss_x, grads_x = jax.jit(jax.value_and_grad(loss_fn))(params)
    fk = np.asarray(jax.flatten_util.ravel_pytree(grads_k)[0], np.float64)
    fx = np.asarray(jax.flatten_util.ravel_pytree(grads_x)[0], np.float64)
    nx = np.linalg.norm(fx)
    rel = float(np.linalg.norm(fk - fx) / nx) if nx > 0 else float("inf")
    print(f"{tag:42s} loss_k={float(loss_k):.6f} loss_x={float(loss_x):.6f} "
          f"grad_rel={rel:.3e}", flush=True)
    return rel


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("flagship-like (vd, no feats, bias .1)", 10, 4, True, 0, 0.1)
    probe("script-like (feats768, no vd, bias .1)", 10, 4, False, 768, 0.1)
    probe("script-like SATURATED (bias 5)", 10, 4, False, 768, 5.0)
    probe("flagship SATURATED (vd, bias 5)", 10, 4, True, 0, 5.0)
    probe("script-like, NO inline PE (bias .1)", 10, 4, False, 768, 0.1,
          inline_pe=False)
    probe("script-like, NO inline PE (bias 5)", 10, 4, False, 768, 5.0,
          inline_pe=False)
