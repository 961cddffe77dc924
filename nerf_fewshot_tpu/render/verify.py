"""On-chip numerics verification: fused kernel gradients vs XLA autodiff.

This is the regression gate for the Mosaic matmul-precision bug class found
in round 3: in-kernel ``jnp.dot`` silently truncates f32 inputs to ONE bf16
MXU pass by default, which corrupted the compositing triangular matmuls'
gradients (44% global error, 155× on the sigma head vs CPU-f32 truth) while
every interpret-mode parity test stayed green (interpret dots are exact f32).
The bug is only observable where Mosaic actually runs — so this check must
execute on the real chip, and it is wired into the round's automatic path:
``bench.py`` runs it by default on TPU and stamps ``numerics_ok`` into its
JSON output; ``tests/test_tpu_numerics.py`` asserts the same bound under
``NERF_TPU_TESTS=1``.

The model shapes are deliberately small (256 rays × 16 samples, 3×128 MLP)
so the check compiles quickly while still exercising every pinned dot:
the log-space transmittance cumsum (forward), the signed suffix-sum
triangular matmuls (backward), and the inline-PE phase matmul. The PE
frequencies are the REAL configs' pos_freq=10/dir_freq=4 — round 4 found
that a pos_freq=6 check is blind to the phase-matmul truncation class
(phase error scales with 2^(pos_freq-1), so small-frequency probes pass
while production configs see O(radian) quantization).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import jax
import jax.flatten_util
import jax.numpy as jnp

# Relative-gradient-error bound for kernel-vs-XLA on chip. Both paths use
# bf16 MXU passes for the MLP matmuls (that is the perf), so they agree to
# ~1e-3; the pre-fix bug produced rel ≈ 0.44. 2e-2 cleanly separates the two
# regimes (same bound as tests/test_tpu_numerics.py).
GRAD_REL_TOL = 2e-2


def kernel_gradient_check(tol: float = GRAD_REL_TOL,
                          sigma_bias: float = 0.1) -> Dict[str, Any]:
    """Run the fused train kernel and XLA autodiff on identical inputs on the
    current default backend; return a dict with the relative gradient error.

    Returns ``{"ok": bool, "grad_rel_err": float, "loss_rel_err": float,
    "backend": str}``. ``ok`` is False if gradients diverge beyond ``tol``,
    losses diverge beyond 1e-4, or the model is gradient-dead (which would
    make the comparison vacuous — a dead sigma head yields zero grads on
    both paths).

    ``sigma_bias`` sets the operating regime: 0.1 is the live-start default;
    a large value (e.g. 5.0) saturates the alphas so transmittances reach
    the 1e-10 epsilon floor — the catastrophic-cancellation regime the
    backward's ``s_after / om`` division amplifies by 1e10, which is where
    training blow-ups live or die (the script_* recipes cross it around
    epoch 3-5).
    """
    from nerf_fewshot_tpu.models import NeRFMLP
    from nerf_fewshot_tpu.render import RenderSettings, render_rays
    from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad

    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        # Fail fast instead of surfacing an opaque Mosaic lowering error:
        # the bug class this gate exists for (silent bf16 truncation of
        # in-kernel dots) is only observable where Mosaic actually compiles;
        # interpret mode's dots are exact f32 and cannot see it.
        raise RuntimeError(
            "kernel_gradient_check is a TPU-only gate (current backend: "
            f"{backend!r}); interpret mode is structurally blind to the "
            "Mosaic matmul-precision class it detects"
        )

    R, S, H, L, PF, DF = 256, 16, 128, 3, 10, 4
    model = NeRFMLP(pos_freq=PF, dir_freq=DF, use_viewdirs=True,
                    hidden_dim=H, num_layers=L, sigma_bias_init=sigma_bias)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    rng = np.random.default_rng(0)
    ro = jnp.asarray(
        np.broadcast_to([0.0, 0.0, 4.0], (R, 3)).astype(np.float32)
    )
    d = rng.standard_normal((R, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0  # rays look into the scene volume
    rd = jnp.asarray(d)
    tgt = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
    mask = jnp.ones((R,))
    settings = RenderSettings(near=2.0, far=6.0, n_samples=S, perturb=False)

    loss_k, grads_k = jax.jit(
        lambda p: fused_train_loss_grad(
            p, ro, rd, tgt, mask, settings, PF, DF, L, H,
        )
    )(params)

    def loss_fn(p):
        def model_fn(pts, dirs, dino):
            return model.apply({"params": p}, pts, dirs)

        out = render_rays(model_fn, ro, rd, settings)
        return jnp.mean((out.rgb - tgt) ** 2)

    loss_x, grads_x = jax.jit(jax.value_and_grad(loss_fn))(params)

    fk = np.asarray(jax.flatten_util.ravel_pytree(grads_k)[0], np.float64)
    fx = np.asarray(jax.flatten_util.ravel_pytree(grads_x)[0], np.float64)
    xla_norm = float(np.linalg.norm(fx))
    live = xla_norm > 1e-6
    grad_rel = (
        float(np.linalg.norm(fk - fx) / xla_norm) if live else float("inf")
    )
    loss_rel = abs(float(loss_k) - float(loss_x)) / max(
        abs(float(loss_x)), 1e-12
    )
    return {
        "ok": bool(live and grad_rel < tol and loss_rel < 1e-4),
        "grad_rel_err": grad_rel,
        "loss_rel_err": loss_rel,
        "backend": jax.default_backend(),
    }
