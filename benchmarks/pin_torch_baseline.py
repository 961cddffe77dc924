"""Pin the torch-CPU reference baseline as a committed median-of-3.

bench.py's ``vs_baseline`` ratio divides the TPU rays/s by an eager
PyTorch-CPU implementation of the same step (the reference framework's
compute style — /root/reference trains eager torch on MPS/CPU). Measuring
that denominator once per bench run made the headline ratio swing 30%
between rounds on an identical kernel (BENCH_r02 1217.75 vs BENCH_r03
917.49) purely from host CPU noise. This script measures each config three
times, records the median (plus the raw samples for spread visibility), and
writes ``benchmarks/torch_baseline_pinned.json`` — which is committed and
becomes bench.py's stable denominator. Re-run it only when the baseline
implementation or host class changes.

Usage: python benchmarks/pin_torch_baseline.py
"""

from __future__ import annotations

import json
import os
import platform
import statistics
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

CONFIGS = ("flagship", "hierarchical", "inference")
N_SAMPLES = 3


def main() -> None:
    from bench import bench_torch_reference

    out = {
        "methodology": (
            "median of 3 runs of bench.bench_torch_reference per config "
            "(eager PyTorch, CPU, same step math as the TPU path); "
            "raw samples retained to show spread"
        ),
        "host": {
            "platform": platform.platform(),
            "processor": platform.processor() or "unknown",
            "cpu_count": os.cpu_count(),
        },
        "configs": {},
    }
    for config in CONFIGS:
        samples = []
        for i in range(N_SAMPLES):
            rate = bench_torch_reference(
                hierarchical=(config == "hierarchical"),
                inference=(config == "inference"),
            )
            samples.append(rate)
            print(f"{config} sample {i + 1}/{N_SAMPLES}: "
                  f"{rate:.1f} rays/s", flush=True)
        out["configs"][config] = {
            "median_rays_per_sec": round(statistics.median(samples), 1),
            "samples_rays_per_sec": [round(s, 1) for s in samples],
        }

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "torch_baseline_pinned.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
