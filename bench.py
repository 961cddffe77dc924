"""Benchmark: few-shot NeRF training throughput (rays/s per chip, fwd+bwd).

Measures the flagship baseline configuration's jitted train step (stratified
sampling → PE → 8×256 MLP with view dirs → alpha compositing → MSE → Adam)
on the available accelerator, and compares against an in-process PyTorch
eager implementation of the same computation (the reference framework's
compute style — stock torch ops, eager dispatch) running on CPU, which is
the class of device the reference published on (MPS/CPU; SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": ratio}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_RAYS = 2048
N_SAMPLES = 64
HIDDEN = 256
N_LAYERS = 8
POS_FREQ, DIR_FREQ = 10, 4
WARMUP, ITERS = 10, 100
TORCH_ITERS = 5


def _enable_compile_cache():
    """Persistent compilation cache: the remote TPU compile service can be
    slow/queued; caching the serialized executable keeps repeat bench runs
    (e.g. the driver's end-of-round run) off the compiler entirely."""
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


def bench_jax() -> float:
    import jax

    _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_fewshot_tpu.models import NeRFMLP
    from nerf_fewshot_tpu.render import RenderSettings, render_rays
    from nerf_fewshot_tpu.render.train_kernel import fused_train_loss_grad

    model = NeRFMLP(
        pos_freq=POS_FREQ, dir_freq=DIR_FREQ, use_viewdirs=True,
        hidden_dim=HIDDEN, num_layers=N_LAYERS,
    )
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)
    settings = RenderSettings(near=2.0, far=6.0, n_samples=N_SAMPLES, perturb=True)
    use_fused = jax.default_backend() in ("tpu", "axon")
    mask = jnp.ones((N_RAYS,))

    @jax.jit
    def step(params, opt_state, key, rays_o, rays_d, target):
        if use_fused:
            # single-pass Pallas train kernel (render + loss + grads fused)
            loss, grads = fused_train_loss_grad(
                params, rays_o, rays_d, target, mask, settings,
                POS_FREQ, DIR_FREQ, N_LAYERS, HIDDEN, key=key,
            )
        else:
            def loss_fn(p):
                def model_fn(pts, dirs, dino):
                    return model.apply({"params": p}, pts, dirs)

                out = render_rays(model_fn, rays_o, rays_d, settings, key=key)
                return jnp.mean((out.rgb - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.standard_normal((N_RAYS, 3)).astype(np.float32))
    rays_d = jnp.asarray(rng.standard_normal((N_RAYS, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32))
    keys = jax.random.split(jax.random.key(1), WARMUP + ITERS)

    for i in range(WARMUP):
        params, opt_state, loss = step(params, opt_state, keys[i], rays_o, rays_d, target)
    float(loss)  # full sync: device round-trip, not just ready-signal

    t0 = time.perf_counter()
    for i in range(ITERS):
        params, opt_state, loss = step(
            params, opt_state, keys[WARMUP + i], rays_o, rays_d, target
        )
    float(loss)
    dt = time.perf_counter() - t0
    return N_RAYS * ITERS / dt


def bench_torch_reference() -> float:
    """Eager PyTorch CPU implementation of the same train step (the
    reference's compute style: stock torch ops, per-op dispatch)."""
    import torch

    torch.manual_seed(0)
    dev = "cpu"

    pos_dim = 3 * (2 * POS_FREQ + 1)
    dir_dim = 3 * (2 * DIR_FREQ + 1)
    layers = []
    in_dim = pos_dim + dir_dim
    for i in range(N_LAYERS):
        layers.append(torch.nn.Linear(in_dim if i == 0 else HIDDEN, HIDDEN))
    trunk = torch.nn.ModuleList(layers).to(dev)
    sigma_head = torch.nn.Linear(HIDDEN, 1).to(dev)
    rgb_head = torch.nn.Linear(HIDDEN, 3).to(dev)
    params = (
        list(trunk.parameters())
        + list(sigma_head.parameters())
        + list(rgb_head.parameters())
    )
    opt = torch.optim.Adam(params, lr=5e-4)

    freqs_p = 2.0 ** torch.linspace(0, POS_FREQ - 1, POS_FREQ)
    freqs_d = 2.0 ** torch.linspace(0, DIR_FREQ - 1, DIR_FREQ)

    def posenc(x, freqs):
        out = [x]
        for f in freqs:
            out += [torch.sin(x * f), torch.cos(x * f)]
        return torch.cat(out, -1)

    rays_o = torch.randn(N_RAYS, 3)
    rays_d = torch.randn(N_RAYS, 3)
    target = torch.rand(N_RAYS, 3)

    def step():
        t = torch.linspace(0.0, 1.0, N_SAMPLES)
        z = 2.0 * (1 - t) + 6.0 * t
        z = z.expand(N_RAYS, N_SAMPLES)
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = torch.cat([mids, z[..., -1:]], -1)
        lower = torch.cat([z[..., :1], mids], -1)
        z = lower + (upper - lower) * torch.rand_like(z)
        pts = rays_o[:, None] + rays_d[:, None] * z[..., None]

        h = torch.cat(
            [
                posenc(pts.reshape(-1, 3), freqs_p),
                posenc(
                    rays_d[:, None].expand(-1, N_SAMPLES, -1).reshape(-1, 3),
                    freqs_d,
                ),
            ],
            -1,
        )
        for layer in trunk:
            h = torch.relu(layer(h))
        sigma = sigma_head(h).reshape(N_RAYS, N_SAMPLES)
        rgb = torch.sigmoid(rgb_head(h)).reshape(N_RAYS, N_SAMPLES, 3)

        dists = z[..., 1:] - z[..., :-1]
        dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * rays_d.norm(dim=-1, keepdim=True)
        alpha = 1 - torch.exp(-torch.relu(sigma) * dists)
        trans = torch.cumprod(
            torch.cat([torch.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1),
            -1,
        )[..., :-1]
        w = alpha * trans
        pred = (w[..., None] * rgb).sum(-2)

        loss = torch.mean((pred - target) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(TORCH_ITERS):
        step()
    dt = time.perf_counter() - t0
    return N_RAYS * TORCH_ITERS / dt


def main():
    jax_rate = bench_jax()
    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".bench_torch_baseline.json"
    )
    torch_rate = None
    if os.path.exists(baseline_path):
        try:
            with open(baseline_path) as f:
                torch_rate = json.load(f)["rays_per_sec"]
        except Exception:
            torch_rate = None
    if torch_rate is None:
        torch_rate = bench_torch_reference()
        try:
            with open(baseline_path, "w") as f:
                json.dump({"rays_per_sec": torch_rate}, f)
        except OSError:
            pass

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec_per_chip_fwd_bwd",
                "value": round(jax_rate, 1),
                "unit": "rays/s",
                "vs_baseline": round(jax_rate / torch_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
