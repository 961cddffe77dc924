"""CLI surface tests: the train entry point end-to-end with profiling."""

import json
import os

import pytest


def test_cli_train_with_profile(tmp_path, monkeypatch, capsys):
    """`train --synthetic --profile DIR` runs epochs, writes the final
    checkpoint and a profiler trace directory (utils.profiling.trace wired
    through the CLI)."""
    from nerf_fewshot_tpu.cli import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(tmp_path)  # save_dir in smoke.yaml is relative
    trace_dir = str(tmp_path / "trace")
    main([
        "train", "--config", os.path.join(repo, "experiments", "smoke.yaml"),
        "--synthetic", "--epochs", "2", "--profile", trace_dir,
    ])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert "best_psnr" in result
    assert os.path.exists(os.path.join("results", "smoke", "final.ckpt"))
    # jax.profiler wrote a trace under the requested dir
    found = []
    for root, _, files in os.walk(trace_dir):
        found += [f for f in files if f.endswith((".pb", ".json.gz", ".xplane.pb"))]
    assert found, f"no trace files under {trace_dir}"
