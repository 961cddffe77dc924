"""Data-parallel scaling-efficiency benchmark on the PRODUCTION step.

Measures fwd+bwd training-step throughput (rays/s) at 1, 2, 4, ..., N
devices with the ray batch scaled proportionally (weak scaling — the regime
that matters for DP), and reports efficiency vs linear. On a multi-chip TPU
slice this exercises ICI all-reduce; on the CPU test platform it validates
the harness itself. Multi-host runs extend the same mesh after
``parallel.initialize_multihost``.

VERDICT r4 item 1: the step under test is the FUSED shard_map kernel path
(parallel/fused_dp.make_dp_fused_loss_grad + optimizer update) — the same
step the Trainer dispatches in production DP — not the ~2.8×-slower XLA
``render_rays`` stand-in, so the ≥85% two-host efficiency gate
(BASELINE.md:39) is measured at production compute intensity. ``path='xla'``
keeps the old stand-in available for comparison. On CPU backends the kernel
runs in Pallas interpret mode (slow; correctness/harness validation only).

BASELINE.md target: >85% efficiency at 2 hosts. 1-device TPU numbers should
land in the flagship bench band (bench.py, ~490-547K rays/s at 2048×64).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.parallel import make_mesh, data_parallel_train_step
from nerf_fewshot_tpu.parallel.fused_dp import make_dp_fused_loss_grad
from nerf_fewshot_tpu.render import RenderSettings, render_rays

HIDDEN, N_LAYERS, POS_FREQ, DIR_FREQ = 256, 8, 10, 4


def _build_xla_step(model, tx, settings):
    """Legacy stand-in: XLA render_rays pipeline (kept for comparison)."""

    def step(params, opt_state, key, rays_o, rays_d, target, mask):
        def loss_fn(p):
            def model_fn(pts, dirs, dino):
                return model.apply({"params": p}, pts, dirs)

            out = render_rays(model_fn, rays_o, rays_d, settings, key=key)
            per_ray = jnp.sum((out.rgb - target) ** 2, -1) / 3.0
            return jnp.sum(per_ray * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def _build_fused_step(mesh, tx, settings, interpret):
    """The production DP step: fused Pallas train kernel per shard inside
    shard_map, loss/grads psum'd over the mesh (trainer.py wires the same
    make_dp_fused_loss_grad), then the optimizer update."""
    dp_fn = make_dp_fused_loss_grad(
        mesh, settings,
        pos_freq=POS_FREQ, dir_freq=DIR_FREQ,
        num_layers=N_LAYERS, hidden_dim=HIDDEN,
        use_viewdirs=True, interpret=interpret,
        axis_name=mesh.axis_names[0],
    )

    def step(params, opt_state, key, rays_o, rays_d, target, mask):
        loss, grads = dp_fn(params, key, rays_o, rays_d, target, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def run_scaling_benchmark(
    batch_per_device: int = 2048,
    n_samples: int = 64,
    iters: int = 100,
    device_counts: Optional[List[int]] = None,
    path: str = "fused",
) -> Dict:
    # iters=100 matches bench.py: each timing window ends in ONE full sync
    # whose tunnel round-trip is fixed cost — at 20 iters it inflated the
    # per-step time ~25% (measured: 417K vs 552K rays/s in the same chip
    # state); at 100 iters the window amortizes it to noise level.
    n_avail = len(jax.devices())
    if device_counts is None:
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail]

    model = NeRFMLP(pos_freq=POS_FREQ, dir_freq=DIR_FREQ, use_viewdirs=True,
                    hidden_dim=HIDDEN, num_layers=N_LAYERS)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    tx = optax.adam(5e-4)
    settings = RenderSettings(near=2.0, far=6.0, n_samples=n_samples,
                              perturb=True)
    rng = np.random.default_rng(0)

    # Pallas kernels need interpret mode off-TPU (harness validation only).
    on_tpu = jax.default_backend() in ("tpu", "axon")
    interpret = not on_tpu

    results = []
    base_rate = None
    # On the forced-CPU test platform the N "devices" are virtual slices of
    # ONE host CPU, so weak-scaling "efficiency" measures core contention,
    # not interconnect overhead — annotate every row so the number cannot be
    # read as a hardware result (it validates the harness/sharding only).
    contended = jax.default_backend() == "cpu"
    for nd in device_counts:
        mesh = make_mesh(nd)
        if path == "fused":
            step = _build_fused_step(mesh, tx, settings, interpret)
        elif path == "xla":
            step = _build_xla_step(model, tx, settings)
        else:
            raise ValueError(f"unknown path {path!r} (fused|xla)")
        step_dp = data_parallel_train_step(
            step, mesh, batch_argnums=(3, 4, 5, 6), donate_argnums=()
        )
        B = batch_per_device * nd
        ro = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32))
        rd = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(0, 1, (B, 3)).astype(np.float32))
        mask = jnp.ones((B,), jnp.float32)
        opt_state = tx.init(params)

        # median-of-3 timing windows (same statistic as bench.py): a single
        # window through the shared-tenancy tunnel can swing ±15%+
        n_windows = 3 if on_tpu else 1
        keys = jax.random.split(jax.random.key(1), n_windows * iters + 3)
        p, o = params, opt_state
        for i in range(3):
            p, o, loss = step_dp(p, o, keys[i], ro, rd, tgt, mask)
        float(loss)
        rates = []
        for w in range(n_windows):
            t0 = time.perf_counter()
            for i in range(iters):
                p, o, loss = step_dp(
                    p, o, keys[3 + w * iters + i], ro, rd, tgt, mask
                )
            float(loss)
            rates.append(B * iters / (time.perf_counter() - t0))
        rates.sort()
        rate = rates[len(rates) // 2]
        if base_rate is None:
            base_rate = rate
        row = {
            "devices": nd,
            "rays_per_sec": round(rate, 1),
            "rays_per_sec_best_window": round(max(rates), 1),
            "rays_per_sec_per_device": round(rate / nd, 1),
        }
        eff = round(rate / (base_rate * nd), 4)
        if contended:
            row["efficiency_core_contended_virtual"] = eff
        else:
            row["efficiency"] = eff
        results.append(row)
    out = {
        "batch_per_device": batch_per_device,
        "backend": jax.default_backend(),
        "path": path,
        "kernel_interpret_mode": interpret,
        "devices_available": n_avail,
        "results": results,
    }
    if contended:
        out["caveat"] = (
            "N virtual devices contend one host CPU: "
            "'efficiency_core_contended_virtual' is a harness/sharding "
            "validation, NOT an interconnect-efficiency measurement"
        )
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(run_scaling_benchmark(), indent=2))
