"""Multi-host DP smoke: one full training step over a cross-process mesh.

The reference has no distributed backend at all (SURVEY.md §2.3); this is
the net-new multi-host leg of the TPU-native framework. Each process:

1. ``initialize_multihost`` (DCN / Gloo rendezvous),
2. builds the global 1-D data mesh over all processes' devices,
3. loads ONLY its own ray shard host-side (host-local data loading, gathered
   through the native C++ ``gather_batch`` op),
4. assembles global arrays with ``make_global_batch`` (no cross-host data
   movement),
5. runs one jitted DP train step — XLA inserts the gradient all-reduce
   across hosts — and checks the loss is finite and replicated.

Run one process per host::

    python -m nerf_fewshot_tpu.parallel.multihost_smoke \
        --coordinator host0:12345 --num-processes 2 --process-id <i>

On a machine without a TPU slice the same path runs on CPU (Gloo), which is
what tests/test_multihost.py does on localhost.
"""

from __future__ import annotations

import argparse


def run_smoke(coordinator: str, num_processes: int, process_id: int,
              rays_per_host: int = 32, force_cpu: bool = False) -> float:
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from nerf_fewshot_tpu.parallel.mesh import (
        initialize_multihost,
        make_global_batch,
        make_mesh,
        process_local_slice,
    )

    initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_fewshot_tpu import native
    from nerf_fewshot_tpu.models import NeRFMLP
    from nerf_fewshot_tpu.parallel import data_parallel_train_step
    from nerf_fewshot_tpu.render import RenderSettings, render_rays

    mesh = make_mesh()
    n_global = rays_per_host * num_processes

    # Host-local data loading: every host generates the SAME global ray set
    # deterministically, then keeps only its shard (real runs slice their
    # view files the same way). The gather runs through the native host op.
    rng = np.random.default_rng(0)
    rays_o = rng.standard_normal((n_global, 3)).astype(np.float32)
    rays_d = rng.standard_normal((n_global, 3)).astype(np.float32)
    targets = rng.uniform(0, 1, (n_global, 3)).astype(np.float32)
    sl = process_local_slice(n_global)
    idx = np.arange(sl.start, sl.stop, dtype=np.int64)
    lo, ld, lt = native.gather_batch(rays_o, rays_d, targets, idx, len(idx))

    g_ro, g_rd, g_tgt = make_global_batch(mesh, (lo, ld, lt))

    model = NeRFMLP(pos_freq=6, dir_freq=2, use_viewdirs=True,
                    hidden_dim=64, num_layers=3)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    settings = RenderSettings(near=2.0, far=6.0, n_samples=8, perturb=False)

    def step(params, opt_state, key, ro, rd, tgt):
        def loss_fn(p):
            def model_fn(pts, dirs, dino):
                return model.apply({"params": p}, pts, dirs)

            out = render_rays(model_fn, ro, rd, settings, key=key)
            return jnp.mean((out.rgb - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_dp = data_parallel_train_step(
        step, mesh, batch_argnums=(3, 4, 5), donate_argnums=(0, 1)
    )
    params, opt_state, loss = step_dp(
        params, opt_state, jax.random.key(1), g_ro, g_rd, g_tgt
    )
    loss_val = float(loss)
    assert np.isfinite(loss_val), loss_val
    print(
        f"multihost_smoke proc {process_id}/{num_processes}: "
        f"devices={len(jax.devices())} loss={loss_val:.6f}",
        flush=True,
    )
    return loss_val


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--rays-per-host", type=int, default=32)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (localhost smoke)")
    a = p.parse_args(argv)
    run_smoke(a.coordinator, a.num_processes, a.process_id,
              rays_per_host=a.rays_per_host, force_cpu=a.cpu)


if __name__ == "__main__":
    main()
