#!/usr/bin/env python
"""One-command reproduction of the reference's published README table.

VERDICT r4 item 7: the published numbers (reference README.md:29-34 — 5
views of Blender-synthetic `lego` at 128², 200 epochs: baseline PSNR 14.71 /
SSIM 0.46 / LPIPS 0.53, with every DINO variant below it) are the parity
north star (BASELINE.md), but the lego dataset is unreachable in this
zero-egress environment. This script is the committed gate for the day the
data IS reachable:

    # real gate (lego mounted or fetched to <dir> with transforms_*.json):
    python tools/run_reference_experiment.py --data /path/to/lego

    # dry-run today (synthetic stand-in scene, full recipe):
    python tools/run_reference_experiment.py --synthetic [--epochs 5]

It runs the four README-table variants (baseline / dino_nerf / lora /
multiscale — the reference's train.py --config contract) end-to-end through
the production Trainer, evaluates on the test split, and writes
``README_table.md`` + ``results.json`` in the output dir, side by side with
the published numbers.

LPIPS caveat: with no pretrained VGG16 weights on disk the LPIPS column is
computed by the random-VGG backend and is labeled as such — it can order
variants but can NOT be compared to the published 0.53 scale. Drop a
torchvision ``vgg16`` state_dict where training/lpips_jax.py's
``find_weights`` looks (or install the ``lpips`` package with its cache) to
get published-scale numbers.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# README.md:29-34 — method name, config file, published PSNR/SSIM/LPIPS
PUBLISHED = [
    ("Baseline NeRF", "baseline.yaml", 14.71, 0.46, 0.53),
    ("DINO-NeRF (frozen)", "dino_nerf.yaml", 12.99, 0.46, 0.54),
    ("LoRA-NeRF (fine-tuned)", "lora.yaml", 12.97, 0.45, 0.54),
    ("Multi-Scale LoRA-NeRF", "multiscale.yaml", 12.94, 0.44, 0.54),
]


def run_variant(name, config_path, args):
    from nerf_fewshot_tpu.cli import _load_datasets, _precompute_features
    from nerf_fewshot_tpu.training.config import load_config
    from nerf_fewshot_tpu.training.trainer import Trainer

    cfg = load_config(config_path)
    out_dir = os.path.join(args.out, os.path.splitext(
        os.path.basename(config_path))[0])
    overrides = {"output": dataclasses.replace(cfg.output, save_dir=out_dir)}
    if args.epochs is not None:
        overrides["epochs"] = args.epochs
    if args.data:
        scene = os.path.abspath(args.data)
        if not os.path.isfile(os.path.join(scene, "transforms_train.json")):
            raise SystemExit(
                f"--data {scene} has no transforms_train.json (expected a "
                "Blender-synthetic scene dir, e.g. .../nerf_synthetic/lego)"
            )
        parent = os.path.dirname(scene)
        overrides["data"] = dataclasses.replace(
            cfg.data,
            data_root=os.path.dirname(parent),
            dataset=os.path.basename(parent),
            scene=os.path.basename(scene),
            source="blender",
        )
    cfg = dataclasses.replace(cfg, **overrides)

    train_data, test_data = _load_datasets(cfg, synthetic=args.synthetic)
    feats = _precompute_features(cfg, train_data)
    trainer = Trainer(
        cfg, train_data, test_data, dino_features=feats,
        log_path=os.path.join(out_dir, "log.jsonl"),
    )
    t0 = time.time()
    trainer.fit()
    wall = time.time() - t0
    metrics = trainer.evaluate(
        max_views=args.max_eval_views,
        dump_dir=os.path.join(out_dir, "renders"),
    )
    trainer.save(os.path.join(out_dir, "final.ckpt"))
    row = {
        "method": name,
        "config": os.path.basename(config_path),
        "best_psnr": max(trainer.best_psnr, metrics["psnr"]),
        "wall_seconds": round(wall, 1),
        "dead_sigma_epochs": trainer.dead_sigma_epochs,
        **metrics,
    }
    print(f"[{name}] PSNR {metrics['psnr']:.2f} SSIM {metrics['ssim']:.3f} "
          f"({wall:.0f}s)")
    return row


def write_table(rows, args):
    lpips_pretrained = all(r.get("lpips_pretrained") for r in rows)
    lp_head = "LPIPS" if lpips_pretrained else "LPIPS (random-VGG†)"
    lines = [
        "# Reference README-table reproduction",
        "",
        f"Data: {'synthetic stand-in scene (DRY RUN)' if args.synthetic or not args.data else args.data}; "
        f"5 views, 128², {args.epochs or 200} epochs per variant.",
        "",
        f"| Method | PSNR (published) | PSNR | SSIM (published) | SSIM | {lp_head} |",
        "|---|---|---|---|---|---|",
    ]
    pub = {cfg: (p, s, lp) for _, cfg, p, s, lp in PUBLISHED}
    for r in rows:
        p, s, lp = pub[r["config"]]
        flag = " ⚠dead-sigma" if r.get("dead_sigma_epochs") else ""
        lines.append(
            f"| {r['method']}{flag} | {p:.2f} | {r['psnr']:.2f} | {s:.2f} | "
            f"{r['ssim']:.3f} | {r.get('lpips', float('nan')):.4f} |"
        )
    if not lpips_pretrained:
        lines += [
            "",
            "† random-VGG LPIPS backend (no pretrained VGG16 weights on "
            "disk): orders variants but is NOT comparable to the published "
            "pretrained-VGG ~0.53 scale.",
        ]
    if args.synthetic or not args.data:
        lines += [
            "",
            "**DRY RUN** on the procedural stand-in scene — the published "
            "PSNR columns (lego) are not expected to match. Re-run with "
            "`--data /path/to/lego` for the 14.71 gate (BASELINE.md).",
        ]
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Reproduce the reference's published README table")
    ap.add_argument("--data", default=None,
                    help="path to the Blender lego scene dir "
                         "(contains transforms_train.json)")
    ap.add_argument("--synthetic", action="store_true",
                    help="dry-run on the procedural stand-in scene")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override epochs (default: the configs' 200)")
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of configs to run (default: all four "
                         "README rows)")
    ap.add_argument("--max-eval-views", type=int, default=None,
                    help="cap test views per eval (default: full split)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "reference_experiment"))
    args = ap.parse_args(argv)

    if not args.data and not args.synthetic:
        ap.error("need --data /path/to/lego (the published-number gate) or "
                 "--synthetic (dry run)")

    # same environment handling as the CLI: NERF_TPU_PLATFORM=cpu forces the
    # local CPU backend (the sitecustomize hook pins the remote-TPU platform
    # before env vars can), and the persistent compile cache keeps repeat
    # remote compiles off the (minutes-slow) tunnel compiler.
    platform = os.environ.get("NERF_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    from nerf_fewshot_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(os.environ.get(
        "NERF_TPU_JAX_CACHE", os.path.join(REPO, ".jax_cache")))

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for name, yaml_name, *_ in PUBLISHED:
        if args.variants and yaml_name not in args.variants and \
                os.path.splitext(yaml_name)[0] not in args.variants:
            continue
        cfg_path = os.path.join(REPO, "experiments", yaml_name)
        rows.append(run_variant(name, cfg_path, args))

    table = write_table(rows, args)
    with open(os.path.join(args.out, "README_table.md"), "w") as f:
        f.write(table)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump({"rows": rows, "data": args.data,
                   "synthetic": bool(args.synthetic or not args.data),
                   "epochs": args.epochs}, f, indent=2, default=float)
    print(table)
    print(f"[out] {args.out}/README_table.md, results.json")


if __name__ == "__main__":
    main()
