"""Command-line entry points.

``python -m nerf_fewshot_tpu.cli train --config experiments/baseline.yaml``
mirrors the reference CLI (reference: src/training/train.py:391-406,
README.md:100-126) and accepts the five reference YAMLs verbatim.
``evaluate`` loads a checkpoint and runs the full metric/analysis harness —
a working version of the reference's truncated evaluate.py.

When the configured Blender scene directory does not exist, ``--synthetic``
(or data.source: synthetic) trains on the built-in procedural scene so the
full pipeline runs self-contained.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np


def _load_datasets(cfg, synthetic: bool):
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.data.blender import load_blender

    scene_dir = os.path.join(cfg.data.data_root, cfg.data.dataset, cfg.data.scene)
    if synthetic or cfg.data.source == "synthetic" or not os.path.isdir(scene_dir):
        if not synthetic and cfg.data.source == "blender" and not os.path.isdir(scene_dir):
            print(f"[data] {scene_dir} not found; using procedural synthetic scene")
        scene = lego_like_scene()
        train = make_scene_dataset(
            scene, n_views=cfg.data.num_views, img_size=cfg.data.resolution
        )
        test = make_scene_dataset(
            scene, n_views=8, img_size=cfg.data.resolution, split="test"
        )
        return train, test
    train = load_blender(
        scene_dir, "train", img_size=cfg.data.resolution
    ).few_shot(cfg.data.num_views)
    test = load_blender(scene_dir, "test", img_size=cfg.data.resolution)
    return train, test


def _precompute_features(cfg, train_data) -> Optional[np.ndarray]:
    """Per-view DINO feature maps, computed once before training — the
    reference does the same (train.py:158-169), which also means DINO-side
    LoRA never receives gradients there (behavior reproduced)."""
    if not cfg.dino.use_dino:
        return None
    if cfg.dino.model_type == "dino_lora":
        raise SystemExit(
            "dino.model_type=dino_lora is the offline token dumper "
            "(extract-features); training conditions on a spatial feature "
            "grid — use single_scale/multi_scale/patch_embed"
        )
    from nerf_fewshot_tpu.models.dino import build_feature_extractor

    extractor, variables = build_feature_extractor(cfg.dino, cfg.data.resolution)
    feats = []
    images = train_data.white_composited()
    for v in range(train_data.n_views):
        feats.append(np.asarray(extractor(variables, images[v])))
    return np.stack(feats)


def cmd_train(args) -> None:
    if args.multihost:
        # must run before any device query; coordinator/process identity
        # come from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
        # JAX_PROCESS_ID (or the TPU metadata server on Cloud TPU slices)
        from nerf_fewshot_tpu.parallel import initialize_multihost

        initialize_multihost()

    import jax

    from nerf_fewshot_tpu.parallel import make_mesh
    from nerf_fewshot_tpu.training.config import load_config
    from nerf_fewshot_tpu.training.trainer import Trainer

    cfg = load_config(args.config)
    if args.epochs is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, epochs=args.epochs)
    if args.wandb:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, output=dataclasses.replace(cfg.output, use_wandb=True)
        )

    train_data, test_data = _load_datasets(cfg, args.synthetic)
    dino_features = _precompute_features(cfg, train_data)

    mesh = None
    if (args.data_parallel or args.multihost) and len(jax.devices()) > 1:
        mesh = make_mesh()
        print(
            f"[mesh] data-parallel over {len(jax.devices())} devices"
            + (f" across {jax.process_count()} hosts" if args.multihost else "")
        )

    trainer = Trainer(
        cfg,
        train_data,
        test_data,
        dino_features=dino_features,
        mesh=mesh,
        log_path=os.path.join(
            cfg.output.save_dir,
            "log.csv" if cfg.output.log_format == "csv" else "log.jsonl",
        ),
    )
    if args.resume:
        trainer.load(args.resume)
        print(f"[resume] from {args.resume} at epoch {trainer.epoch}")
    if args.nan_guard:
        from nerf_fewshot_tpu.utils.profiling import enable_nan_guard

        enable_nan_guard(True)
    if args.profile:
        from nerf_fewshot_tpu.utils.profiling import trace

        with trace(args.profile):
            metrics = trainer.fit()
        print(f"[profile] trace written to {args.profile}")
    else:
        metrics = trainer.fit()
    trainer.save(os.path.join(cfg.output.save_dir, "final.ckpt"))
    summary = {"final_metrics": metrics, "best_psnr": trainer.best_psnr}
    if trainer.dead_sigma_epochs:
        # run ended inside the zero-gradient collapse basin — annotate the
        # artifact so no table row quotes this number unexplained
        summary["dead_sigma_epochs"] = trainer.dead_sigma_epochs
    print(json.dumps(summary))


def cmd_evaluate(args) -> None:
    from nerf_fewshot_tpu.training.config import load_config
    from nerf_fewshot_tpu.training.trainer import Trainer
    from nerf_fewshot_tpu.training.evaluate import comprehensive_evaluation

    cfg = load_config(args.config)
    train_data, test_data = _load_datasets(cfg, args.synthetic)
    dino_features = _precompute_features(cfg, train_data)
    trainer = Trainer(cfg, train_data, test_data, dino_features=dino_features)
    trainer.load(args.checkpoint)
    out_dir = args.output or os.path.join(cfg.output.save_dir, "evaluation")
    results = comprehensive_evaluation(trainer, out_dir, n_orbit=args.n_orbit)
    m = results.get("metrics", {})
    if "lpips" in m:
        backend = m.get("lpips_backend", "unknown")
        caveat = (
            ""
            if m.get("lpips_pretrained")
            else " — random-VGG features: NOT comparable to the reference's "
            "pretrained-VGG scale (~0.53, reference train.py:99-101)"
        )
        print(
            f"[eval] PSNR {m.get('psnr', float('nan')):.2f}  "
            f"SSIM {m.get('ssim', float('nan')):.3f}  "
            f"LPIPS {m['lpips']:.4f} [{backend}{caveat}]"
        )
    print(json.dumps(results, default=float))


def cmd_extract_features(args) -> None:
    """Precompute per-view feature maps to .npz (the reference's
    extract_features.py equivalent, src/training/extract_features.py).

    ``dino.model_type: dino_lora`` selects the reference's faithful offline
    dump: LoRADINO over the full processor chain, saving CLS-STRIPPED
    ``last_hidden_state`` patch tokens per view — (V, Hp·Wp, hidden), the
    reference's ``features[:, 1:]`` (extract_features.py:33-35). Every other
    model_type dumps the configured extractor's projected feature grids
    (the training-path superset behavior)."""
    from nerf_fewshot_tpu.training.config import load_config

    cfg = load_config(args.config)
    train_data, _ = _load_datasets(cfg, args.synthetic)
    if not cfg.dino.use_dino:
        raise SystemExit("config has model.use_dino: false — nothing to extract")
    if cfg.dino.model_type == "dino_lora":
        from nerf_fewshot_tpu.models.dino import build_feature_extractor

        extractor, variables = build_feature_extractor(
            cfg.dino, cfg.data.resolution
        )
        images = train_data.white_composited()
        feats = np.stack([
            np.asarray(extractor(variables, images[v]))[1:]  # drop CLS
            for v in range(train_data.n_views)
        ])
    else:
        feats = _precompute_features(cfg, train_data)
    out = args.output or os.path.join(cfg.output.save_dir, "features.npz")
    os.makedirs(os.path.dirname(os.path.abspath(out)) or ".", exist_ok=True)
    np.savez_compressed(out, features=feats)
    print(json.dumps({"saved": out, "shape": list(feats.shape)}))


def cmd_bench_scaling(args) -> None:
    """Rays/s at 1..N devices (DP scaling-efficiency harness)."""
    from benchmarks.scaling import run_scaling_benchmark

    results = run_scaling_benchmark(
        batch_per_device=args.batch_per_device, n_samples=args.n_samples,
        iters=args.iters, path=args.path,
    )
    print(json.dumps(results))


def main(argv=None) -> None:
    # Platform override for subprocess/debug runs: the hosted environment's
    # sitecustomize pins JAX_PLATFORMS=axon before user code runs, so a plain
    # env var cannot reach JAX — but jax.config still can while no
    # computation has executed. NERF_TPU_PLATFORM=cpu forces CPU.
    platform = os.environ.get("NERF_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    parser = argparse.ArgumentParser(prog="nerf_fewshot_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train an experiment config")
    p_train.add_argument("--config", required=True)
    p_train.add_argument("--epochs", type=int, default=None)
    p_train.add_argument("--resume", default=None)
    p_train.add_argument("--synthetic", action="store_true",
                         help="force the procedural synthetic scene")
    p_train.add_argument("--data-parallel", action="store_true",
                         help="shard ray batches over all local devices")
    p_train.add_argument("--multihost", action="store_true",
                         help="initialize jax.distributed (one process per "
                              "host; coordinator from JAX_COORDINATOR_ADDRESS "
                              "etc.) and mesh over ALL hosts' devices")
    p_train.add_argument("--profile", default=None, metavar="DIR",
                         help="capture a jax.profiler trace of training "
                              "(view with XProf/TensorBoard)")
    p_train.add_argument("--nan-guard", action="store_true",
                         help="re-run de-optimized on NaN and raise at the "
                              "offending primitive (jax_debug_nans)")
    p_train.add_argument("--wandb", action="store_true",
                         help="mirror training/eval records to a wandb run "
                              "(the reference trainer's tracking sink, "
                              "train.py:345-371); equivalent to "
                              "output.use_wandb: true")
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("evaluate", help="checkpoint analysis harness")
    p_eval.add_argument("--config", required=True)
    p_eval.add_argument("--checkpoint", required=True)
    p_eval.add_argument("--output", default=None)
    p_eval.add_argument("--n-orbit", type=int, default=8)
    p_eval.add_argument("--synthetic", action="store_true")
    p_eval.set_defaults(fn=cmd_evaluate)

    p_feat = sub.add_parser("extract-features",
                            help="precompute per-view DINO feature maps")
    p_feat.add_argument("--config", required=True)
    p_feat.add_argument("--output", default=None)
    p_feat.add_argument("--synthetic", action="store_true")
    p_feat.set_defaults(fn=cmd_extract_features)

    p_scale = sub.add_parser("bench-scaling",
                             help="DP scaling-efficiency benchmark")
    p_scale.add_argument("--batch-per-device", type=int, default=2048,
                         help="rays per device (2048 = flagship bench shape)")
    p_scale.add_argument("--n-samples", type=int, default=64)
    p_scale.add_argument("--iters", type=int, default=100,
                         help="steps per timing window (matches bench.py; "
                              "short windows under-amortize the tunnel's "
                              "end-of-window sync round-trip)")
    p_scale.add_argument("--path", choices=("fused", "xla"), default="fused",
                         help="fused = production shard_map kernel step; "
                              "xla = legacy render_rays stand-in")
    p_scale.set_defaults(fn=cmd_bench_scaling)

    args = parser.parse_args(argv)
    # Persistent XLA compile cache for every subcommand: the remote TPU
    # compile service is slow (minutes/executable); repeat runs of the same
    # config shapes should never touch it. NERF_TPU_JAX_CACHE overrides the
    # location; failure to set up the cache is silently non-fatal.
    from nerf_fewshot_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
