"""TPU-only numerics pins (skipped on CPU, where matmul precision works
differently): `compute_dtype: bfloat16` must be numerically EQUAL to the
default f32 path, because XLA's DEFAULT precision on TPU already truncates
f32 matmul inputs to one bf16 MXU pass — the flag changes where the cast
happens, not the arithmetic. This is why bf16 also gives zero speedup
(measured: 3.43 vs 3.42 ms/step; RESULTS.md round-2 decomposition)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="pins TPU matmul-precision semantics; CPU does real f32 matmuls",
)


@requires_tpu
def test_bf16_compute_dtype_equals_default_on_tpu():
    from nerf_fewshot_tpu.models import NeRFMLP
    from nerf_fewshot_tpu.render import RenderSettings
    from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad

    R, S, H, L, PF, DF = 256, 16, 128, 3, 6, 2
    model = NeRFMLP(pos_freq=PF, dir_freq=DF, use_viewdirs=True,
                    hidden_dim=H, num_layers=L)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    rd = jnp.asarray(rng.standard_normal((R, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (R, 3)).astype(np.float32))
    mask = jnp.ones((R,))
    settings = RenderSettings(near=2.0, far=6.0, n_samples=S, perturb=False)

    loss32, grads32 = jax.jit(
        lambda p: fused_train_loss_grad(
            p, ro, rd, tgt, mask, settings, PF, DF, L, H,
            compute_dtype="float32",
        )
    )(params)
    loss16, grads16 = jax.jit(
        lambda p: fused_train_loss_grad(
            p, ro, rd, tgt, mask, settings, PF, DF, L, H,
            compute_dtype="bfloat16",
        )
    )(params)
    np.testing.assert_allclose(float(loss16), float(loss32), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads32),
                    jax.tree_util.tree_leaves(grads16)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7
        )


@requires_tpu
def test_kernel_grads_match_xla_on_tpu():
    """On REAL hardware the fused kernel's gradients must track the XLA
    autodiff path. This pins the round-3 find: Mosaic in-kernel `jnp.dot`
    truncates f32 inputs to ONE bf16 pass by default, which silently
    corrupted the compositing triangular matmuls (log-space cumsum forward;
    signed suffix sums backward) — measured 44% global gradient error and a
    155× sigma-head error vs CPU-f32 truth before those dots were pinned to
    Precision.HIGHEST. Interpret-mode parity tests can NEVER catch this
    class of bug (interpret dots are exact f32), hence an on-chip pin.

    The check itself lives in render/verify.py and is also run automatically
    by bench.py's numerics leg, so the driver's end-of-round bench catches
    this class without a manual NERF_TPU_TESTS invocation. The helper
    guards against a dead-sigma init (zero grads on both paths would pass
    vacuously).
    """
    from nerf_fewshot_tpu.render.verify import kernel_gradient_check

    result = kernel_gradient_check()
    assert result["grad_rel_err"] != float("inf"), "dead model: vacuous test"
    assert result["ok"], (
        f"kernel diverges from XLA on-chip: grad rel="
        f"{result['grad_rel_err']:.3e} loss rel={result['loss_rel_err']:.3e}"
    )
