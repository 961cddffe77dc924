"""Parity via weight transplant: build the reference architectures in torch,
import their state_dicts, and require allclose outputs — the strongest
checkpoint-compatibility check available without the real lego checkpoints."""

import numpy as np
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models import NeRFMLP, NeRFWithDINO
from nerf_fewshot_tpu.ops.encoding import positional_encoding
from nerf_fewshot_tpu.utils.torch_import import (
    import_nerf_mlp_state_dict,
    import_nerf_with_dino_state_dict,
)

RNG = np.random.default_rng(5)


class RefBaselineMLP(tnn.Module):
    """The reference baseline MLP layout (nerf_model.py:5-24): `layers.{i}`
    trunk + sigma_out/rgb_out heads, input pre-encoded positions."""

    def __init__(self, pos_dim=63, hidden_dim=64, n_layers=3):
        super().__init__()
        self.layers = tnn.ModuleList()
        for i in range(n_layers):
            self.layers.append(
                tnn.Linear(pos_dim if i == 0 else hidden_dim, hidden_dim)
            )
        self.sigma_out = tnn.Linear(hidden_dim, 1)
        self.rgb_out = tnn.Linear(hidden_dim, 3)

    def forward(self, x):
        h = x
        for layer in self.layers:
            h = torch.relu(layer(h))
        return torch.sigmoid(self.rgb_out(h)), self.sigma_out(h)


def test_import_baseline_state_dict_output_parity():
    tm = RefBaselineMLP()
    model = NeRFMLP(pos_freq=10, use_viewdirs=False, hidden_dim=64, num_layers=3)
    pts = RNG.standard_normal((40, 3)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(pts))["params"]

    params = import_nerf_mlp_state_dict(params, tm.state_dict())
    rgb, sigma = model.apply({"params": params}, jnp.asarray(pts))

    with torch.no_grad():
        enc = []
        x = torch.from_numpy(pts)
        enc.append(x)
        for f in (2.0 ** torch.linspace(0, 9, 10)):
            enc += [torch.sin(x * f), torch.cos(x * f)]
        t_rgb, t_sigma = tm(torch.cat(enc, -1))
    np.testing.assert_allclose(np.asarray(rgb), t_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), t_sigma.numpy(), rtol=1e-4, atol=1e-4)


class RefLoRALinear(tnn.Module):
    def __init__(self, in_f, out_f, rank=4, alpha=16.0):
        super().__init__()
        self.original = tnn.Linear(in_f, out_f)
        self.lora_A = tnn.Linear(in_f, rank, bias=False)
        self.lora_B = tnn.Linear(rank, out_f, bias=False)
        self.scaling = alpha / rank
        tnn.init.normal_(self.lora_B.weight, std=0.02)

    def forward(self, x):
        return self.original(x) + self.scaling * self.lora_B(self.lora_A(x))


def test_import_lora_state_dict_output_parity():
    hidden, n_layers, rank = 64, 2, 4
    model = NeRFMLP(pos_freq=10, use_viewdirs=False, hidden_dim=hidden,
                    num_layers=n_layers, lora_rank=rank, lora_alpha=16.0)
    pts = RNG.standard_normal((30, 3)).astype(np.float32)
    params = model.init(jax.random.key(1), jnp.asarray(pts))["params"]

    layers = tnn.ModuleList(
        [RefLoRALinear(63 if i == 0 else hidden, hidden, rank) for i in range(n_layers)]
    )
    sigma_out = tnn.Linear(hidden, 1)
    rgb_out = tnn.Linear(hidden, 3)
    sd = {}
    for i, l in enumerate(layers):
        for k, v in l.state_dict().items():
            sd[f"layers.{i}.{k}"] = v
    for k, v in sigma_out.state_dict().items():
        sd[f"sigma_out.{k}"] = v
    for k, v in rgb_out.state_dict().items():
        sd[f"rgb_out.{k}"] = v

    params = import_nerf_mlp_state_dict(params, sd)
    rgb, sigma = model.apply({"params": params}, jnp.asarray(pts))

    with torch.no_grad():
        x = torch.from_numpy(pts)
        enc = [x]
        for f in (2.0 ** torch.linspace(0, 9, 10)):
            enc += [torch.sin(x * f), torch.cos(x * f)]
        h = torch.cat(enc, -1)
        for l in layers:
            h = torch.relu(l(h))
        t_rgb = torch.sigmoid(rgb_out(h))
        t_sigma = sigma_out(h)
    np.testing.assert_allclose(np.asarray(rgb), t_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), t_sigma.numpy(), rtol=1e-4, atol=1e-4)


class RefNeRFWithDINO(tnn.Module):
    """The reference module stack's state_dict naming (nerf_mlp.py:86-215)."""

    def __init__(self, pos_freq=6, dir_freq=2, dino_dim=8, hidden=32, n_density=2):
        super().__init__()
        pos_dim = 3 * (2 * pos_freq + 1)
        self.dino_fusion = tnn.Module()
        self.dino_fusion.fusion = tnn.Sequential(
            tnn.Linear(pos_dim + dino_dim, hidden), tnn.ReLU(),
            tnn.Linear(hidden, hidden), tnn.ReLU(),
        )
        self.dino_fusion.attention = tnn.Sequential(
            tnn.Linear(hidden, hidden // 4), tnn.ReLU(),
            tnn.Linear(hidden // 4, 2), tnn.Softmax(dim=-1),
        )
        self.dino_fusion.output_proj = tnn.Linear(hidden, hidden)
        self.density_mlp = tnn.Module()
        layers = []
        for i in range(n_density):
            layers += [tnn.Linear(hidden, hidden), tnn.ReLU()]
        self.density_mlp.density_layers = tnn.Sequential(*layers)
        self.density_mlp.density_head = tnn.Linear(hidden, 1)
        self.density_mlp.feature_head = tnn.Linear(hidden, hidden)
        dir_dim = 3 * (2 * dir_freq + 1)
        ch = hidden // 2
        self.color_mlp = tnn.Module()
        self.color_mlp.color_layers = tnn.Sequential(
            tnn.Linear(hidden + dir_dim, ch), tnn.ReLU(),
            tnn.Linear(ch, ch // 2), tnn.ReLU(),
            tnn.Linear(ch // 2, 3), tnn.Sigmoid(),
        )


def test_import_nerf_with_dino_state_dict():
    hidden, n_density, dino_dim = 32, 2, 8
    ref = RefNeRFWithDINO(hidden=hidden, n_density=n_density, dino_dim=dino_dim)
    model = NeRFWithDINO(pos_freq=6, dir_freq=2, dino_dim=dino_dim,
                         hidden_dim=hidden, num_density_layers=n_density)
    pts = jnp.asarray(RNG.standard_normal((20, 3)).astype(np.float32))
    dirs = jnp.asarray(RNG.standard_normal((20, 3)).astype(np.float32))
    dino = jnp.asarray(RNG.standard_normal((20, dino_dim)).astype(np.float32))
    params = model.init(jax.random.key(0), pts, dirs, dino)["params"]
    params2 = import_nerf_with_dino_state_dict(params, ref.state_dict())
    # every imported leaf must differ from random init (mapping exercised)
    n_diff = 0
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        if a.shape == b.shape and not np.allclose(np.asarray(a), np.asarray(b)):
            n_diff += 1
    assert n_diff >= 10
    rgb, density = model.apply({"params": params2}, pts, dirs, dino)
    assert bool(jnp.all(jnp.isfinite(rgb))) and bool(jnp.all(jnp.isfinite(density)))
