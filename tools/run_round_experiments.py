"""Run the full on-chip variant table and collect artifacts.

Re-runs every reference-analog experiment config end-to-end through the CLI
(the reference's README.md:29-34 comparison table structure: baseline vs
every feature-conditioned variant) and writes per-run artifacts + a
summary.json under ``artifacts/<tag>_<name>/``.

Round-4 motivation: every pre-round-4 training artifact was produced by a
kernel whose gradients were later proven 44% off CPU-f32 truth (the Mosaic
in-kernel dot bf16-truncation bug, fixed in fefb615 with Precision.HIGHEST
pins — see CLAUDE.md gotchas). The science had to be re-run post-fix.

Usage: python tools/run_round_experiments.py [--tag round4] [--configs a,b]
Each run goes through a subprocess (isolation against a wedged TPU tunnel)
under a timeout; progress prints per run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (config, reference analog) — the README table rows plus the hierarchical
# capability config (the reference implements but never wires hierarchical
# sampling; SURVEY.md §0.3).
CONFIGS = [
    ("baseline", "Baseline NeRF (train.py + baseline.yaml)"),
    ("dino_nerf", "DINO-NeRF frozen features (train.py + dino_nerf.yaml)"),
    ("multiscale", "Multi-Scale LoRA-NeRF (train_multiscale.py)"),
    ("script_baseline", "train_baseline.py (ViT patch-embed conditioned)"),
    ("script_lora", "train_lora.py (rank-4 LoRA, epoch-51 freeze)"),
    ("script_projection", "train_projection.py (viewdirs, rank-16 LoRA)"),
    ("script_dino_lora_pose", "train_dino_lora_pose.py (CSV loss log)"),
    ("hierarchical", "baseline + first-class importance sampling"),
]
RUN_TIMEOUT_S = 3600


def run_one(name: str, tag: str) -> dict:
    out_dir = os.path.join(REPO, "artifacts", f"{tag}_{name}")
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(REPO, "experiments", f"{name}.yaml")) as f:
        doc = yaml.safe_load(f)
    doc.setdefault("output", {})["save_dir"] = out_dir
    cfg_path = os.path.join(out_dir, "config_used.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(doc, f)

    t0 = time.time()
    # stream stdout+stderr to a live log (visibility into slow remote
    # compiles; capture_output would hide everything until exit)
    log_path = os.path.join(out_dir, "stdout.log")
    with open(log_path, "w") as logf:
        proc = subprocess.run(
            [sys.executable, "-m", "nerf_fewshot_tpu.cli", "train",
             "--config", cfg_path, "--synthetic"],
            cwd=REPO, stdout=logf, stderr=subprocess.STDOUT, text=True,
            timeout=RUN_TIMEOUT_S,
        )
    wall = time.time() - t0
    with open(log_path) as f:
        stdout = f.read()
    if proc.returncode != 0:
        return {"name": name, "ok": False, "wall_s": wall,
                "error": stdout.strip().splitlines()[-1:]}

    # final json line of stdout is {"final_metrics": ..., "best_psnr": ...}
    final = {}
    for line in reversed(stdout.strip().splitlines()):
        try:
            final = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    # best metrics + sustained rate from the JSONL/CSV log
    best = {}
    rate = None
    log_jsonl = os.path.join(out_dir, "log.jsonl")
    if os.path.exists(log_jsonl):
        with open(log_jsonl) as f:
            for line in f:
                rec = json.loads(line)
                if "rays_per_sec" in rec:
                    rate = rec["rays_per_sec"]
                if "psnr" in rec and rec["psnr"] > best.get("psnr", -1e9):
                    best = {k: rec[k] for k in ("psnr", "ssim", "lpips")
                            if k in rec}
    summary = {
        "name": name,
        "ok": True,
        "final_metrics": final.get("final_metrics", {}),
        "best_psnr": final.get("best_psnr"),
        "best_epoch_metrics": best,
        "final_rays_per_sec": rate,
        "wall_s": round(wall, 1),
        # run ended in the exactly-zero-gradient collapse basin for this
        # many consecutive trailing epochs (trainer dead-sigma probe) —
        # variant-table rows must carry this annotation (VERDICT r4 #4)
        "dead_sigma_epochs": final.get("dead_sigma_epochs", 0),
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
        f.write("\n")
    # checkpoints are large and untracked; keep artifacts lean
    for fn in os.listdir(out_dir):
        if fn.endswith(".ckpt"):
            os.remove(os.path.join(out_dir, fn))
    return summary


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--tag", default="round4")
    p.add_argument("--configs", default=None,
                   help="comma-separated subset (default: all)")
    args = p.parse_args()
    only = set(args.configs.split(",")) if args.configs else None

    run_list = list(CONFIGS)
    if only:
        known = {name for name, _ in CONFIGS}
        for extra in sorted(only - known):
            # ad-hoc variant configs (e.g. script_baseline_live) are fair
            # game as long as experiments/<name>.yaml exists
            path = os.path.join(REPO, "experiments", f"{extra}.yaml")
            if not os.path.exists(path):
                raise SystemExit(f"--configs {extra}: no {path}")
            run_list.append((extra, f"ad-hoc variant ({extra}.yaml)"))

    results = []
    for name, analog in run_list:
        if only and name not in only:
            continue
        print(f"=== {name} ({analog}) ===", flush=True)
        try:
            summary = run_one(name, args.tag)
        except subprocess.TimeoutExpired:
            summary = {"name": name, "ok": False, "error": "timeout"}
        results.append(summary)
        print(json.dumps(summary), flush=True)

    table_path = os.path.join(
        REPO, "artifacts", f"{args.tag}_variant_table.json"
    )
    # Merge-by-name so a subset run (--configs) updates its rows without
    # clobbering the rest of an existing aggregate.
    merged = {}
    if os.path.exists(table_path):
        try:
            with open(table_path) as f:
                merged = {r["name"]: r for r in json.load(f) if "name" in r}
        except (json.JSONDecodeError, TypeError):
            merged = {}
    for r in results:
        merged[r["name"]] = r
    with open(table_path, "w") as f:
        json.dump(list(merged.values()), f, indent=2)
        f.write("\n")
    print(f"wrote {table_path}")


if __name__ == "__main__":
    main()
