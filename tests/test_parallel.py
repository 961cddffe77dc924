"""Multi-device tests on the virtual 8-CPU-device platform: DP-sharded
training must match single-device training (loss and updated params), and the
driver entry points must compile and run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.parallel import make_mesh, data_parallel_train_step
from nerf_fewshot_tpu.render import RenderSettings, render_rays

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(n_rays=64, n_samples=8):
    model = NeRFMLP(pos_freq=4, dir_freq=2, use_viewdirs=True, hidden_dim=32,
                    num_layers=2)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    settings = RenderSettings(near=2.0, far=6.0, n_samples=n_samples)

    def step(params, opt_state, key, rays_o, rays_d, target):
        def loss_fn(p):
            def model_fn(pts, dirs, dino):
                return model.apply({"params": p}, pts, dirs)

            out = render_rays(model_fn, rays_o, rays_d, settings, key=None)
            return jnp.mean((out.rgb - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.standard_normal((n_rays, 3)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((n_rays, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n_rays, 3)).astype(np.float32)),
    )
    return step, params, opt_state, batch


def test_dp_sharded_step_matches_single_device():
    step, params, opt_state, batch = _setup()
    key = jax.random.key(1)

    p1, _, loss1 = jax.jit(step)(params, opt_state, key, *batch)

    mesh = make_mesh(8)
    step_dp = data_parallel_train_step(
        step, mesh, batch_argnums=(3, 4, 5), donate_argnums=()
    )
    p8, _, loss8 = step_dp(params, opt_state, key, *batch)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_dp_batch_is_actually_sharded():
    """The compiled DP step must consume a batch sharded over all 8 devices
    (guards against silent full replication)."""
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.zeros((64, 3))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    assert len(xs.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(8, 3)}


def test_graft_entry_forward():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_process_local_slice_single_process():
    from nerf_fewshot_tpu.parallel import process_local_slice

    sl = process_local_slice(64)
    assert (sl.start, sl.stop) == (0, 64)


def test_make_global_batch_places_shards():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nerf_fewshot_tpu.parallel import make_global_batch, make_mesh

    mesh = make_mesh(8)
    a = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    b = np.ones((16,), np.float32)
    ga, gb = make_global_batch(mesh, (a, b))
    assert ga.sharding == NamedSharding(mesh, P("data"))
    np.testing.assert_array_equal(np.asarray(ga), a)
    np.testing.assert_array_equal(np.asarray(gb), b)


def test_scaling_benchmark_fused_path_harness():
    """benchmarks/scaling.py must measure the PRODUCTION fused shard_map
    step (VERDICT r4 item 1). Structural run at tiny shapes on the virtual
    mesh, plus loss equality of the benchmark's own step builder across
    device counts (perturb off so shards see identical z grids; the
    perturbed production equality is pinned by test_fused_dp)."""
    import optax

    from benchmarks import scaling
    from benchmarks.scaling import (
        _build_fused_step,
        run_scaling_benchmark,
    )
    from nerf_fewshot_tpu.render import RenderSettings

    out = run_scaling_benchmark(
        batch_per_device=32, n_samples=16, iters=1, device_counts=[1, 2],
        path="fused",
    )
    assert out["path"] == "fused" and out["kernel_interpret_mode"]
    assert len(out["results"]) == 2
    for row in out["results"]:
        assert np.isfinite(row["rays_per_sec"]) and row["rays_per_sec"] > 0
    assert "efficiency_core_contended_virtual" in out["results"][0]

    # loss equality across mesh sizes for the benchmark's own step
    model = NeRFMLP(pos_freq=scaling.POS_FREQ, dir_freq=scaling.DIR_FREQ,
                    use_viewdirs=True, hidden_dim=scaling.HIDDEN,
                    num_layers=scaling.N_LAYERS)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    tx = optax.adam(5e-4)
    settings = RenderSettings(near=2.0, far=6.0, n_samples=16, perturb=False)
    rng = np.random.default_rng(3)
    B = 64
    ro = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32))
    rd = jnp.asarray(rng.standard_normal((B, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (B, 3)).astype(np.float32))
    mask = jnp.ones((B,), jnp.float32)

    losses = {}
    for nd in (1, 4):
        mesh = make_mesh(nd)
        step = _build_fused_step(mesh, tx, settings, interpret=True)
        step_dp = data_parallel_train_step(
            step, mesh, batch_argnums=(3, 4, 5, 6), donate_argnums=()
        )
        _, _, loss = step_dp(params, tx.init(params), jax.random.key(1),
                             ro, rd, tgt, mask)
        losses[nd] = float(loss)
    np.testing.assert_allclose(losses[4], losses[1], rtol=1e-5)


def test_trainer_eval_and_render_views_under_mesh(tmp_path):
    """Eval rendering (incl. the batched render_views path) must work with
    an active DP mesh: params live as replicated NamedSharding arrays and
    the unsharded eval chunk fn consumes them directly."""
    from nerf_fewshot_tpu.data import lego_like_scene, make_scene_dataset
    from nerf_fewshot_tpu.training.config import config_from_dict
    from nerf_fewshot_tpu.training.trainer import Trainer

    scene = lego_like_scene()
    train = make_scene_dataset(scene, n_views=3, img_size=24, gt_samples=64)
    test = make_scene_dataset(scene, n_views=2, img_size=24, gt_samples=64,
                              split="test")
    cfg = config_from_dict({
        "experiment": {"name": "mesh-eval"},
        "data": {"resolution": 24, "num_views": 3, "near": 2.0, "far": 6.0},
        "nerf_model": {"pos_freq": 6, "dir_freq": 2, "hidden_dim": 32,
                       "num_layers": 2, "sigma_bias": 0.1},
        "training": {"epochs": 1, "batch_size": 256,
                     "progressive_schedule": {
                         "epochs_0_50": [24, 24, 16],
                         "epochs_50_100": [24, 24, 16],
                         "epochs_100_plus": [24, 24, 16]}},
        "rendering": {"chunk_size": 192, "white_bkgd": True},
        "output": {"save_dir": str(tmp_path), "val_freq": 100,
                   "save_freq": 100},
    })
    tr = Trainer(cfg, train, test, mesh=make_mesh(8),
                 log_path=str(tmp_path / "log.jsonl"))
    loss = tr.train_epoch(0)
    assert np.isfinite(loss)
    m = tr.evaluate()
    assert np.isfinite(m["psnr"])
    rgb, depth, acc = tr.render_views([test.poses[0], test.poses[1]])
    assert rgb.shape == (2, 24, 24, 3) and np.all(np.isfinite(rgb))
