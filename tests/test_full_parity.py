"""End-to-end parity gate (BASELINE.md): rendered images and pixel gradients
w.r.t. MLP/LoRA parameters must be allclose to the reference pipeline.

Torch RNG cannot be matched from JAX, so sampled depths (z_vals) are
injected as fixed inputs on both sides (SURVEY.md §7 hard-parts note) and
the weights are transplanted via the torch-import utility. The torch side
re-states the reference equations (posenc → trunk MLP → heads → volume
compositing → MSE) with stock torch ops.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from nerf_fewshot_tpu.models import NeRFMLP
from nerf_fewshot_tpu.ops.composite import volume_render
from nerf_fewshot_tpu.utils.torch_import import import_nerf_mlp_state_dict

RNG = np.random.default_rng(21)

R, S = 32, 24
HIDDEN, N_LAYERS = 64, 3
POS_FREQ, DIR_FREQ = 10, 4


class TorchPipeline(tnn.Module):
    def __init__(self):
        super().__init__()
        in_dim = 3 * (2 * POS_FREQ + 1) + 3 * (2 * DIR_FREQ + 1)
        self.layers = tnn.ModuleList(
            tnn.Linear(in_dim if i == 0 else HIDDEN, HIDDEN)
            for i in range(N_LAYERS)
        )
        self.sigma_out = tnn.Linear(HIDDEN, 1)
        self.rgb_out = tnn.Linear(HIDDEN, 3)

    @staticmethod
    def posenc(x, F):
        out = [x]
        for f in 2.0 ** torch.linspace(0, F - 1, F):
            out += [torch.sin(x * f), torch.cos(x * f)]
        return torch.cat(out, -1)

    def forward(self, rays_o, rays_d, z_vals, target):
        pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
        dirs = rays_d[:, None].expand(-1, S, -1)
        h = torch.cat(
            [self.posenc(pts.reshape(-1, 3), POS_FREQ),
             self.posenc(dirs.reshape(-1, 3), DIR_FREQ)], -1
        )
        for layer in self.layers:
            h = torch.relu(layer(h))
        sigma = self.sigma_out(h).reshape(R, S)
        rgb = torch.sigmoid(self.rgb_out(h)).reshape(R, S, 3)

        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = torch.cat([dists, torch.full_like(dists[..., :1], 1e10)], -1)
        dists = dists * rays_d.norm(dim=-1, keepdim=True)
        alpha = 1 - torch.exp(-TF.relu(sigma) * dists)
        trans = torch.cumprod(
            torch.cat([torch.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1),
            -1,
        )[..., :-1]
        w = alpha * trans
        image = (w[..., None] * rgb).sum(-2)
        loss = torch.mean((image - target) ** 2)
        return image, loss


def test_image_and_pixel_gradients_allclose():
    tm = TorchPipeline()
    model = NeRFMLP(pos_freq=POS_FREQ, dir_freq=DIR_FREQ, use_viewdirs=True,
                    hidden_dim=HIDDEN, num_layers=N_LAYERS)
    params0 = model.init(
        jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )["params"]
    params = import_nerf_mlp_state_dict(params0, tm.state_dict())

    rays_o = RNG.standard_normal((R, 3)).astype(np.float32)
    rays_d = RNG.standard_normal((R, 3)).astype(np.float32)
    z_vals = np.sort(RNG.uniform(2.0, 6.0, (R, S)).astype(np.float32), -1)
    target = RNG.uniform(0, 1, (R, 3)).astype(np.float32)

    # ---- torch side: image + gradients
    t_img, t_loss = tm(
        torch.from_numpy(rays_o), torch.from_numpy(rays_d),
        torch.from_numpy(z_vals), torch.from_numpy(target),
    )
    t_loss.backward()

    # ---- jax side with identical injected z_vals
    def render(p):
        pts = (
            jnp.asarray(rays_o)[:, None]
            + jnp.asarray(rays_d)[:, None] * jnp.asarray(z_vals)[..., None]
        )
        dirs = jnp.broadcast_to(jnp.asarray(rays_d)[:, None], (R, S, 3))
        rgb, sigma = model.apply(
            {"params": p}, pts.reshape(-1, 3), dirs.reshape(-1, 3)
        )
        out = volume_render(
            rgb.reshape(R, S, 3), sigma.reshape(R, S),
            jnp.asarray(z_vals), jnp.asarray(rays_d),
        )
        return out.rgb

    def loss_fn(p):
        return jnp.mean((render(p) - jnp.asarray(target)) ** 2)

    img = render(params)
    loss, grads = jax.value_and_grad(loss_fn)(params)

    # image parity
    np.testing.assert_allclose(
        np.asarray(img), t_img.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    # loss parity
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)
    # gradient parity for every parameter
    for i in range(N_LAYERS):
        np.testing.assert_allclose(
            np.asarray(grads[f"trunk_{i}"]["kernel"]),
            tm.layers[i].weight.grad.numpy().T,
            rtol=2e-3, atol=1e-7, err_msg=f"trunk_{i} kernel",
        )
        np.testing.assert_allclose(
            np.asarray(grads[f"trunk_{i}"]["bias"]),
            tm.layers[i].bias.grad.numpy(),
            rtol=2e-3, atol=1e-7, err_msg=f"trunk_{i} bias",
        )
    np.testing.assert_allclose(
        np.asarray(grads["sigma_head"]["kernel"]),
        tm.sigma_out.weight.grad.numpy().T, rtol=2e-3, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(grads["rgb_head"]["kernel"]),
        tm.rgb_out.weight.grad.numpy().T, rtol=2e-3, atol=1e-7,
    )
