#!/bin/bash
# Round perf session: post-fix headline re-measurement, the head-mode lever,
# tile-sweep re-validation, hierarchical + inference numbers, and the
# real-chip single-device scaling anchor. Run AFTER the science runner (one
# chip; serialize). Results append to artifacts/<tag>_perf/perf.jsonl.
# Usage: tools/run_round_perf.sh [tag]   (default round5)
set -u
cd "$(dirname "$0")/.."
TAG=${1:-round5}
OUT=artifacts/${TAG}_perf
mkdir -p "$OUT"
LOG="$OUT/perf.jsonl"

run() {
  local tag="$1"; shift
  echo "=== $tag: $*" >&2
  local line
  line=$(timeout 3000 "$@" 2>>"$OUT/perf.stderr.log" | tail -1)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"result\": $line}" >> "$LOG"
    echo "$line" >&2
  else
    echo "{\"tag\": \"$tag\", \"result\": null}" >> "$LOG"
  fi
}

run flagship_mxu            python bench.py --config flagship
run flagship_vpu            python bench.py --config flagship --head-mode vpu --skip-numerics
run flagship_mxu_stash6     python bench.py --config flagship --stash-mb 6 --skip-numerics
run flagship_mxu_stash24    python bench.py --config flagship --stash-mb 24 --skip-numerics
run hierarchical_mxu        python bench.py --config hierarchical --skip-numerics
run hierarchical_vpu        python bench.py --config hierarchical --head-mode vpu --skip-numerics
run inference_fwd           python bench.py --config inference --skip-numerics
run scaling_1chip           python -m nerf_fewshot_tpu.cli bench-scaling --batch-per-device 2048
echo "perf session done" >&2
