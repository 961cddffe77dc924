#!/usr/bin/env python
"""Cross-platform gradient-truth comparison for the spike-state diag.

Consumes the npz dumps written by ``DIAG_SAVE=<prefix> diag_spike_state.py``
run once on the chip and once with ``DIAG_CPU=1`` (interpret kernel +
CPU-XLA, exact-f32 dots), and reports each on-chip path's distance from the
CPU-f32 truth:

    DIAG_SAVE=/tmp/diag_tpu python tools/diag_spike_state.py <ckpt>
    DIAG_CPU=1 DIAG_SAVE=/tmp/diag_cpu python tools/diag_spike_state.py <ckpt>
    python tools/diag_compare_truth.py /tmp/diag_cpu /tmp/diag_tpu

Round-5 measured conclusion (VERDICT r4 item 4a, RESULTS.md): at the
script_baseline epoch-5 spike state the fused kernel and TPU-XLA are
EQUIDISTANT from exact-f32 truth (e.g. view 0: 9.850e-2 vs 9.847e-2; view
2: 0.4255 vs 0.4260) while differing from each other by only 3e-4..3e-3,
and pinning the dW accumulation dots to HIGHEST changes nothing — the
spike-state deviation is the bf16 matmul truncation BOTH paths apply (XLA
DEFAULT truncates f32 matmul inputs on TPU too), not a kernel defect.
"""

import glob
import sys

import numpy as np


def main(cpu_prefix: str, tpu_prefix: str) -> None:
    views = sorted(glob.glob(f"{cpu_prefix}_view*.npz"))
    if not views:
        raise SystemExit(f"no dumps at {cpu_prefix}_view*.npz")
    print(f"{'view':>4} {'kernel_vs_truth':>16} {'kernelHI_vs_truth':>18} "
          f"{'xlaTPU_vs_truth':>16} {'kernel_vs_xlaTPU':>17}")
    for path in views:
        v = path[len(cpu_prefix) + 5:-4]
        truth = np.load(path)["xla"]  # CPU-XLA f32: exact-f32 dots
        c = np.load(f"{tpu_prefix}_view{v}.npz")
        n = np.linalg.norm(truth)
        rk = np.linalg.norm(c["kernel"] - truth) / n
        rkh = np.linalg.norm(c["kernel_dwh"] - truth) / n
        rx = np.linalg.norm(c["xla"] - truth) / n
        rkx = np.linalg.norm(c["kernel"] - c["xla"]) / np.linalg.norm(
            c["xla"])
        print(f"{v:>4} {rk:16.3e} {rkh:18.3e} {rx:16.3e} {rkx:17.3e}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])
