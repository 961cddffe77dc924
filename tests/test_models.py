"""Model-stack parity tests: flax modules vs torch oracles with transplanted
weights. Verifies forward outputs, gradients, LoRA math, and init
distributions against the exact architectures the reference defines (or
implies — the DINO/LoRA-capable NeRFMLP is missing from the reference repo
but called by five of its scripts; SURVEY.md §0.3)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models import (
    NeRFMLP,
    NeRFWithDINO,
    LoRADense,
    lora_label_fn,
)

RNG = np.random.default_rng(1)


def t2n(x):
    return x.detach().numpy()


def set_linear(linear: tnn.Linear, params):
    """Copy flax TorchDense params {kernel (in,out), bias (out,)} into torch."""
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(np.asarray(params["kernel"]).T))
        if "bias" in params:
            linear.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))


# ------------------------------------------------------------------ NeRFMLP


class TorchBaselineNeRF(tnn.Module):
    """Torch replica of the functional-stack MLP surface: pre-encoded input →
    n×(Linear+ReLU) trunk → sigma head + sigmoid rgb head."""

    def __init__(self, in_dim, hidden, n_layers, dino_dim=0):
        super().__init__()
        dims = [in_dim + dino_dim] + [hidden] * n_layers
        self.trunk = tnn.ModuleList(
            tnn.Linear(dims[i], dims[i + 1]) for i in range(n_layers)
        )
        self.sigma = tnn.Linear(hidden, 1)
        self.rgb = tnn.Linear(hidden, 3)

    def forward(self, x):
        h = x
        for layer in self.trunk:
            h = torch.relu(layer(h))
        return torch.sigmoid(self.rgb(h)), self.sigma(h)


def torch_posenc(x, num_freqs):
    freqs = 2.0 ** torch.linspace(0.0, num_freqs - 1, num_freqs)
    out = [x]
    for f in freqs:
        out.append(torch.sin(x * f))
        out.append(torch.cos(x * f))
    return torch.cat(out, dim=-1)


def test_nerf_mlp_baseline_matches_torch():
    model = NeRFMLP(pos_freq=10, use_viewdirs=False, dino_dim=0,
                    hidden_dim=64, num_layers=4)
    pts = RNG.standard_normal((50, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(pts))["params"]

    tm = TorchBaselineNeRF(63, 64, 4)
    for i in range(4):
        set_linear(tm.trunk[i], params[f"trunk_{i}"])
    set_linear(tm.sigma, params["sigma_head"])
    set_linear(tm.rgb, params["rgb_head"])

    rgb, sigma = model.apply({"params": params}, jnp.asarray(pts))
    t_rgb, t_sigma = tm(torch_posenc(torch.from_numpy(pts), 10))
    np.testing.assert_allclose(np.asarray(rgb), t2n(t_rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), t2n(t_sigma), rtol=1e-4, atol=1e-4)


def test_nerf_mlp_viewdirs_and_dino_shapes():
    model = NeRFMLP(pos_freq=12, dir_freq=4, use_viewdirs=True, dino_dim=16,
                    hidden_dim=32, num_layers=2)
    pts = jnp.asarray(RNG.standard_normal((10, 3)).astype(np.float32))
    dirs = jnp.asarray(RNG.standard_normal((10, 3)).astype(np.float32))
    dino = jnp.asarray(RNG.standard_normal((10, 16)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs, dino)["params"]
    rgb, sigma = model.apply({"params": params}, pts, dirs, dino)
    assert rgb.shape == (10, 3) and sigma.shape == (10, 1)
    assert float(jnp.min(rgb)) >= 0.0 and float(jnp.max(rgb)) <= 1.0


def test_nerf_mlp_gradients_match_torch():
    model = NeRFMLP(pos_freq=4, hidden_dim=32, num_layers=2)
    pts = RNG.standard_normal((20, 3)).astype(np.float32)
    params = model.init(jax.random.key(2), jnp.asarray(pts))["params"]

    tm = TorchBaselineNeRF(27, 32, 2)
    for i in range(2):
        set_linear(tm.trunk[i], params[f"trunk_{i}"])
    set_linear(tm.sigma, params["sigma_head"])
    set_linear(tm.rgb, params["rgb_head"])

    def loss_fn(p):
        rgb, sigma = model.apply({"params": p}, jnp.asarray(pts))
        return jnp.mean(rgb**2) + jnp.mean(sigma**2)

    g = jax.grad(loss_fn)(params)

    t_rgb, t_sigma = tm(torch_posenc(torch.from_numpy(pts), 4))
    (t_rgb.pow(2).mean() + t_sigma.pow(2).mean()).backward()
    np.testing.assert_allclose(
        np.asarray(g["trunk_0"]["kernel"]),
        t2n(tm.trunk[0].weight.grad).T,
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g["rgb_head"]["bias"]),
        t2n(tm.rgb.bias.grad),
        rtol=1e-3, atol=1e-6,
    )


def test_init_distribution_matches_torch_bounds():
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    model = NeRFMLP(pos_freq=10, hidden_dim=256, num_layers=2)
    pts = jnp.zeros((4, 3))
    params = model.init(jax.random.key(3), pts)["params"]
    k = np.asarray(params["trunk_1"]["kernel"])  # fan_in 256
    bound = 1.0 / math.sqrt(256)
    assert np.abs(k).max() <= bound + 1e-7
    # roughly uniform: std of U(-b,b) is b/sqrt(3)
    assert abs(k.std() - bound / math.sqrt(3)) < 0.15 * bound


# ------------------------------------------------------------------ LoRA


class TorchLoRALinear(tnn.Module):
    """Torch replica of the reference LoRA layer (eval mode: no dropout)."""

    def __init__(self, in_f, out_f, rank, alpha):
        super().__init__()
        self.base = tnn.Linear(in_f, out_f)
        self.lora_A = tnn.Linear(in_f, rank, bias=False)
        self.lora_B = tnn.Linear(rank, out_f, bias=False)
        self.scaling = alpha / rank

    def forward(self, x):
        return self.base(x) + self.scaling * self.lora_B(self.lora_A(x))


def test_lora_dense_matches_torch():
    layer = LoRADense(features=24, rank=4, alpha=16.0, dropout_rate=0.1)
    x = RNG.standard_normal((30, 16)).astype(np.float32)
    params = layer.init(jax.random.key(0), jnp.asarray(x))["params"]
    # perturb lora_b away from zero so the adapter path is exercised
    params["lora_b"] = jnp.asarray(
        RNG.standard_normal((4, 24)).astype(np.float32) * 0.1
    )

    tm = TorchLoRALinear(16, 24, 4, 16.0)
    set_linear(tm.base, params["base"])
    with torch.no_grad():
        tm.lora_A.weight.copy_(torch.from_numpy(np.asarray(params["lora_a"]).T))
        tm.lora_B.weight.copy_(torch.from_numpy(np.asarray(params["lora_b"]).T))

    out = layer.apply({"params": params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out), t2n(tm(torch.from_numpy(x))), rtol=1e-4, atol=1e-5
    )


def test_lora_b_initialized_to_zero_noop():
    """Fresh LoRA must be a no-op (B=0), matching the reference init."""
    layer = LoRADense(features=8, rank=4)
    x = jnp.asarray(RNG.standard_normal((5, 6)).astype(np.float32))
    params = layer.init(jax.random.key(1), x)["params"]
    assert np.all(np.asarray(params["lora_b"]) == 0.0)
    base_only = LoRADense(features=8, rank=0)
    base_params = {"base": params["base"]}
    np.testing.assert_allclose(
        np.asarray(layer.apply({"params": params}, x)),
        np.asarray(base_only.apply({"params": base_params}, x)),
        rtol=1e-6,
    )


def test_lora_a_init_bound():
    """A ~ kaiming_uniform(a=sqrt(5)) → bound = 1/sqrt(fan_in)."""
    layer = LoRADense(features=8, rank=64)
    x = jnp.zeros((2, 100))
    params = layer.init(jax.random.key(4), x)["params"]
    a = np.asarray(params["lora_a"])
    assert np.abs(a).max() <= 1.0 / math.sqrt(100) + 1e-7
    assert np.abs(a).max() > 0.5 / math.sqrt(100)


def test_lora_label_fn():
    model = NeRFMLP(pos_freq=4, hidden_dim=16, num_layers=2, lora_rank=2)
    pts = jnp.zeros((2, 3))
    params = model.init(jax.random.key(0), pts)["params"]
    labels = lora_label_fn(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    lora_count = sum(1 for _, v in flat if v == "lora")
    base_count = sum(1 for _, v in flat if v == "base")
    assert lora_count == 4  # 2 trunk layers × (A, B)
    assert base_count > 0


# -------------------------------------------------------------- NeRFWithDINO


class TorchFusion(tnn.Module):
    """Torch replica of NeRFDINOFusion (dino_feature_model.py:150-196)."""

    def __init__(self, pos_dim, dino_dim, hidden):
        super().__init__()
        self.f0 = tnn.Linear(pos_dim + dino_dim, hidden)
        self.f1 = tnn.Linear(hidden, hidden)
        self.a0 = tnn.Linear(hidden, hidden // 4)
        self.a1 = tnn.Linear(hidden // 4, 2)
        self.out = tnn.Linear(hidden, hidden)

    def fusion(self, x):
        return torch.relu(self.f1(torch.relu(self.f0(x))))

    def forward(self, pos, dino):
        fused = self.fusion(torch.cat([pos, dino], -1))
        w = torch.softmax(self.a1(torch.relu(self.a0(fused))), -1)
        final = self.fusion(torch.cat([pos * w[:, 0:1], dino * w[:, 1:2]], -1))
        return self.out(final)


class TorchNeRFWithDINO(tnn.Module):
    def __init__(self, pos_freq, dir_freq, dino_dim, hidden, n_density):
        super().__init__()
        self.pos_freq, self.dir_freq = pos_freq, dir_freq
        pos_dim = 3 * (2 * pos_freq + 1)
        dir_dim = 3 * (2 * dir_freq + 1)
        self.fusion = TorchFusion(pos_dim, dino_dim, hidden)
        self.density_trunk = tnn.ModuleList(
            tnn.Linear(hidden, hidden) for _ in range(n_density)
        )
        self.density_head = tnn.Linear(hidden, 1)
        self.feature_head = tnn.Linear(hidden, hidden)
        ch = hidden // 2
        self.c0 = tnn.Linear(hidden + dir_dim, ch)
        self.c1 = tnn.Linear(ch, ch // 2)
        self.c2 = tnn.Linear(ch // 2, 3)

    def forward(self, pts, dirs, dino):
        pe = torch_posenc(pts, self.pos_freq)
        de = torch_posenc(dirs, self.dir_freq)
        fused = self.fusion(pe, dino)
        h = fused
        for layer in self.density_trunk:
            h = torch.relu(layer(h))
        density = torch.relu(self.density_head(h))
        feat = self.feature_head(h)
        rgb = torch.sigmoid(self.c2(torch.relu(self.c1(torch.relu(self.c0(
            torch.cat([feat, de], -1)))))))
        return rgb, density


def test_nerf_with_dino_matches_torch():
    hidden, n_density, dino_dim = 32, 3, 8
    model = NeRFWithDINO(pos_freq=6, dir_freq=2, dino_dim=dino_dim,
                         hidden_dim=hidden, num_density_layers=n_density)
    pts = RNG.standard_normal((40, 3)).astype(np.float32)
    dirs = RNG.standard_normal((40, 3)).astype(np.float32)
    dino = RNG.standard_normal((40, dino_dim)).astype(np.float32)
    params = model.init(
        jax.random.key(0), jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(dino)
    )["params"]

    tm = TorchNeRFWithDINO(6, 2, dino_dim, hidden, n_density)
    fz = params["dino_fusion"]
    set_linear(tm.fusion.f0, fz["fusion_0"])
    set_linear(tm.fusion.f1, fz["fusion_1"])
    set_linear(tm.fusion.a0, fz["attention_0"])
    set_linear(tm.fusion.a1, fz["attention_1"])
    set_linear(tm.fusion.out, fz["output_proj"])
    dm = params["density_mlp"]
    for i in range(n_density):
        set_linear(tm.density_trunk[i], dm[f"layer_{i}"])
    set_linear(tm.density_head, dm["density_head"])
    set_linear(tm.feature_head, dm["feature_head"])
    cm = params["color_mlp"]
    set_linear(tm.c0, cm["layer_0"])
    set_linear(tm.c1, cm["layer_1"])
    set_linear(tm.c2, cm["rgb"])

    rgb, density = model.apply(
        {"params": params}, jnp.asarray(pts), jnp.asarray(dirs), jnp.asarray(dino)
    )
    t_rgb, t_density = tm(
        torch.from_numpy(pts), torch.from_numpy(dirs), torch.from_numpy(dino)
    )
    np.testing.assert_allclose(np.asarray(rgb), t2n(t_rgb), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(density), t2n(t_density), rtol=1e-4, atol=1e-5)
