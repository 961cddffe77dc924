"""Full-Trainer multi-host smoke: the real training engine (phases, padded
static batches, lax.scan view steps, optax) over a cross-process device
mesh. Complements multihost_smoke.py (which drives a hand-rolled step).

Each process builds the same synthetic dataset deterministically, enters
the global mesh, and trains ``--epochs`` epochs; losses must agree across
processes bit-for-bit (replicated outputs). Run one process per host::

    python -m nerf_fewshot_tpu.parallel.multihost_train_smoke \
        --coordinator host0:12345 --num-processes 2 --process-id <i> [--cpu]
"""

from __future__ import annotations

import argparse


def run(coordinator: str, num_processes: int, process_id: int,
        epochs: int = 2, force_cpu: bool = False,
        interpret_kernels: bool = False) -> float:
    """``interpret_kernels``: route the step through the shard_map fused
    Pallas kernel (parallel/fused_dp) in interpret mode — proving the
    kernel path across PROCESS boundaries, not just the single-process
    multi-device mesh."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from nerf_fewshot_tpu.parallel.mesh import initialize_multihost, make_mesh

    initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np

    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    import nerf_fewshot_tpu.training.trainer as trainer_mod

    if interpret_kernels:
        trainer_mod.FORCE_INTERPRET_KERNELS = True

    res = 16
    cfg = config_from_dict({
        "experiment": {"name": "multihost-train-smoke"},
        "data": {"resolution": res, "num_views": 2, "near": 2.0, "far": 6.0},
        # kernel eligibility needs a 128-lane-aligned trunk
        "nerf_model": {"pos_freq": 6, "dir_freq": 2,
                       "hidden_dim": 128 if interpret_kernels else 64,
                       "num_layers": 2, "sigma_bias": 0.1},
        "training": {"epochs": epochs, "phases": [
            {"start": 0, "H": res, "n_samples": 8, "batch_size": 128}]},
        "optimizer": {"lr": 5e-3, "weight_decay": 0.0, "lr_milestones": []},
        "rendering": {"chunk_size": 256, "white_bkgd": True,
                      "backend": "auto" if interpret_kernels else "xla"},
        "output": {"save_dir": f"/tmp/mh_train_{process_id}",
                   "val_freq": 1000, "save_freq": 1000},
    })
    scene = lego_like_scene()
    data = make_scene_dataset(scene, n_views=2, img_size=res, gt_samples=32)
    mesh = make_mesh()

    trainer = trainer_mod.Trainer(cfg, data, mesh=mesh)
    if interpret_kernels:
        assert trainer._kernel_eligible(), "kernel path not eligible"
    losses = [trainer.train_epoch(e) for e in range(epochs)]
    assert np.isfinite(losses).all(), losses
    print(
        f"multihost_train_smoke proc {process_id}/{num_processes}: "
        f"devices={len(jax.devices())} "
        f"kernel={'fused' if interpret_kernels else 'xla'} losses="
        + ",".join(f"{l:.6f}" for l in losses),
        flush=True,
    )
    return losses[-1]


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--interpret-kernels", action="store_true",
                   help="run the shard_map fused kernel path (interpret "
                        "mode) instead of XLA autodiff")
    a = p.parse_args(argv)
    run(a.coordinator, a.num_processes, a.process_id, epochs=a.epochs,
        force_cpu=a.cpu, interpret_kernels=a.interpret_kernels)


if __name__ == "__main__":
    main()
