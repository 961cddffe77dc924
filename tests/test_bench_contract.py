"""bench.py contract: the committed pinned torch baseline must exist and
cover every bench config — `vs_baseline` headline stability depends on it
(a per-run single-sample denominator swung 30% between rounds)."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_pinned_baseline_covers_all_configs():
    import bench

    for config in ("flagship", "hierarchical", "inference"):
        rate = bench.load_pinned_baseline(config)
        assert rate is not None and rate > 0, config


def test_pinned_baseline_is_median_of_samples():
    path = os.path.join(REPO, "benchmarks", "torch_baseline_pinned.json")
    with open(path) as f:
        pinned = json.load(f)
    assert "methodology" in pinned and "host" in pinned
    for config, rec in pinned["configs"].items():
        samples = sorted(rec["samples_rays_per_sec"])
        assert len(samples) == 3, config
        assert rec["median_rays_per_sec"] == samples[1], config
