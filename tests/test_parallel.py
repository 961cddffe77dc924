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
