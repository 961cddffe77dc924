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


def test_cli_wandb_flag_mirrors_records(tmp_path, monkeypatch, capsys):
    """--wandb routes every logged record to the wandb run (the reference
    trainer's tracking sink, train.py:345-371) — verified with an injected
    mock module recording init/log/finish calls."""
    import sys
    import types

    from nerf_fewshot_tpu.cli import main

    recorded = {"init": [], "logs": []}

    class _Run:
        def log(self, rec):
            recorded["logs"].append(rec)

        def finish(self):
            recorded["finished"] = True

    fake = types.ModuleType("wandb")

    def _init(**kw):
        recorded["init"].append(kw)
        return _Run()

    fake.init = _init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(tmp_path)
    main([
        "train", "--config", os.path.join(repo, "experiments", "smoke.yaml"),
        "--synthetic", "--epochs", "2", "--wandb",
    ])
    assert recorded["init"], "wandb.init was never called"
    assert recorded["init"][0]["project"] == "nerf-fewshot-tpu"
    train_recs = [r for r in recorded["logs"] if "train_loss" in r]
    assert len(train_recs) == 2, recorded["logs"]
    assert all("rays_per_sec" in r for r in train_recs)


def test_evaluate_metrics_carry_lpips_provenance(tmp_path):
    """Every artifact carrying an LPIPS number must say which backend
    produced it — a random-init-feature LPIPS is NOT comparable to the
    published pretrained-VGG scale (train.py:324-329)."""
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    from nerf_fewshot_tpu.training.trainer import Trainer

    res = 16
    cfg = config_from_dict({
        "experiment": {"name": "prov"},
        "data": {"resolution": res, "num_views": 2},
        "nerf_model": {"hidden_dim": 32, "num_layers": 2},
        "training": {"epochs": 1, "batch_size": 64,
                     "progressive_schedule": {
                         "epochs_0_50": [res, res, 8],
                         "epochs_50_100": [res, res, 8],
                         "epochs_100_plus": [res, res, 8]}},
        "rendering": {"chunk_size": 128},
        "output": {"save_dir": str(tmp_path)},
    })
    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=2, img_size=res, gt_samples=32)
    test = make_scene_dataset(scene, n_views=1, img_size=res, split="test",
                              gt_samples=32)
    tr = Trainer(cfg, train, test)
    m = tr.evaluate(max_views=1)
    assert "lpips" in m
    assert m["lpips_pretrained"] is False  # no weight cache in this env
    assert m["lpips_backend"] == "jax-random-vgg"


def test_enable_compile_cache(tmp_path, monkeypatch):
    """enable_compile_cache points JAX's persistent compilation cache at the
    requested directory (CLI main enables it for every subcommand so repeat
    runs skip the slow remote TPU compile service)."""
    import jax

    from nerf_fewshot_tpu.utils.profiling import enable_compile_cache

    target = str(tmp_path / "cache")
    prev = jax.config.jax_compilation_cache_dir
    prev_min_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        used = enable_compile_cache(target)
        assert used == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # env-var override wins when no explicit dir is passed
        override = str(tmp_path / "cache2")
        monkeypatch.setenv("NERF_TPU_JAX_CACHE", override)
        assert enable_compile_cache() == override
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min_secs
        )


def test_run_reference_experiment_dry_run(tmp_path, capsys):
    """tools/run_reference_experiment.py (VERDICT r4 item 7): the committed
    one-command path to the published README table. Dry-run on the stand-in
    scene with one variant; the artifact must carry the published columns,
    the measured columns, and the random-VGG LPIPS caveat."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import run_reference_experiment as rre

    rre.main([
        "--synthetic", "--epochs", "1", "--variants", "baseline",
        "--max-eval-views", "1", "--out", str(tmp_path),
    ])
    table = open(tmp_path / "README_table.md").read()
    assert "14.71" in table  # published column present
    assert "DRY RUN" in table
    assert "random-VGG" in table
    results = json.load(open(tmp_path / "results.json"))
    assert results["synthetic"] is True
    row = results["rows"][0]
    assert row["config"] == "baseline.yaml"
    assert row["psnr"] > 0 and "lpips_backend" in row
