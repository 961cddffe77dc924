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


def test_image_and_gradients_vs_reference_own_modules():
    """Same gate as above, but the torch side is built ENTIRELY from the
    reference's own imported source (VERDICT r4 item 2): PositionalEncoding
    (positional_encoding.py:5-33) → nerf_model.NeRFMLP (nerf_model.py:5-24)
    → nerf_mlp.VolumeRenderer (nerf_mlp.py:160-215) → nerf_mlp.NeRFLoss
    (nerf_mlp.py:217-258). Gradients are produced by autograd through the
    reference's actual code, so no transcription sits between the two sides.
    Skips cleanly when /root/reference is unmounted.
    """
    import reference_oracle as ref

    pe_mod = ref.load("positional_encoding")
    nmod = ref.load("nerf_model")
    nm = ref.load("nerf_mlp")

    torch.manual_seed(7)
    enc_pos = pe_mod.PositionalEncoding(num_freqs=POS_FREQ)
    enc_dir = pe_mod.PositionalEncoding(num_freqs=DIR_FREQ)
    in_dim = 3 * (2 * POS_FREQ + 1) + 3 * (2 * DIR_FREQ + 1)
    tm = nmod.NeRFMLP(pos_dim=in_dim, hidden_dim=HIDDEN, n_layers=N_LAYERS)
    vr = nm.VolumeRenderer()
    vr.eval()
    crit = nm.NeRFLoss(rgb_weight=1.0)

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

    # ---- torch side: every op is the reference's own module
    ro_t, rd_t = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    z_t = torch.from_numpy(z_vals)
    pts_t = ro_t[:, None] + rd_t[:, None] * z_t[..., None]
    dirs_t = rd_t[:, None].expand(-1, S, -1)
    h = torch.cat(
        [enc_pos(pts_t.reshape(-1, 3)), enc_dir(dirs_t.reshape(-1, 3))], -1
    )
    out_t = tm(h)  # (N, 4) = [sigmoid rgb, raw sigma]
    rgb_t = out_t[..., :3].reshape(R, S, 3)
    sigma_t = out_t[..., 3].reshape(R, S)
    r_rgb, r_depth, r_w = vr(rgb_t, sigma_t[..., None], z_t, rd_t)
    losses_t = crit({"rgb": r_rgb}, {"rgb": torch.from_numpy(target)})
    losses_t["total"].backward()

    # ---- jax side, production ops, identical injected z_vals
    def render(p):
        pts = (
            jnp.asarray(rays_o)[:, None]
            + jnp.asarray(rays_d)[:, None] * jnp.asarray(z_vals)[..., None]
        )
        dirs = jnp.broadcast_to(jnp.asarray(rays_d)[:, None], (R, S, 3))
        rgb, sigma = model.apply(
            {"params": p}, pts.reshape(-1, 3), dirs.reshape(-1, 3)
        )
        return volume_render(
            rgb.reshape(R, S, 3), sigma.reshape(R, S),
            jnp.asarray(z_vals), jnp.asarray(rays_d),
        )

    def loss_fn(p):
        return jnp.mean((render(p).rgb - jnp.asarray(target)) ** 2)

    out = render(params)
    loss, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(
        np.asarray(out.rgb), r_rgb.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.depth), r_depth.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.weights), r_w.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(loss), float(losses_t["total"]), rtol=1e-5)
    for i in range(N_LAYERS):
        np.testing.assert_allclose(
            np.asarray(grads[f"trunk_{i}"]["kernel"]),
            tm.layers[i].weight.grad.numpy().T,
            rtol=2e-3, atol=1e-7, err_msg=f"trunk_{i} kernel vs reference",
        )
    np.testing.assert_allclose(
        np.asarray(grads["sigma_head"]["kernel"]),
        tm.sigma_out.weight.grad.numpy().T, rtol=2e-3, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(grads["rgb_head"]["kernel"]),
        tm.rgb_out.weight.grad.numpy().T, rtol=2e-3, atol=1e-7,
    )


def test_multi_step_training_trajectory_allclose():
    """Run N full Adam steps of the COMPLETE pipeline (injected z_vals → PE →
    MLP → composite → MSE → Adam → repeat) on both sides from transplanted
    init, and assert the loss trajectory and final parameters stay allclose.

    This composes the op-level oracles + single-step parity above into a
    *training loop* gate: the reference's published numbers are the product
    of exactly this loop (/root/reference/src/training/train.py:244-292 —
    per-batch render_rays → NeRFLoss → Adam.step). It is the strongest proxy
    for the PSNR-14.71 parity gate available in this environment (no real
    lego data / pretrained weights; BASELINE.md). Torch RNG cannot be
    matched from JAX, so per-step stratified z_vals and per-step ray batches
    are pre-generated with numpy and injected identically on both sides; the
    optimizer under test is the product path (training/optim.make_optimizer,
    torch-Adam semantics incl. pre-moment L2 decay) vs torch.optim.Adam.

    Both sides run in float64: Adam's ĝ/√v̂ normalization amplifies f32
    gradient rounding into O(lr) update differences wherever a gradient is
    near zero (measured: 8e-4 final-param drift at f32 — pure float noise,
    not semantics), while in f64 identical *semantics* must agree to ~1e-9.
    The f32 compute path itself is pinned by the single-step test above and
    the kernel parity suite; this test pins the loop's MATH.
    """
    import optax

    from nerf_fewshot_tpu.training.config import OptimizerConfig
    from nerf_fewshot_tpu.training.optim import make_optimizer

    N_STEPS = 8
    LR, WD = 5e-3, 1e-4  # large-ish lr so params actually travel in 8 steps

    # deterministic init: earlier test modules consume torch's global RNG,
    # and the descent sanity-assert below depends on the starting point
    torch.manual_seed(3)
    tm = TorchPipeline().double()

    rng = np.random.default_rng(77)
    # Fixed ray batch + target (the pixels being fit), fresh stratified
    # z_vals each step (the per-step perturb jitter) — the shape of the real
    # training loop, so the loss can genuinely descend across steps.
    rays_o_f = rng.standard_normal((R, 3))
    rays_d_f = rng.standard_normal((R, 3))
    target_f = rng.uniform(0, 1, (R, 3))
    batches = []
    for _ in range(N_STEPS):
        z_vals = np.sort(rng.uniform(2.0, 6.0, (R, S)), -1)
        batches.append((rays_o_f, rays_d_f, z_vals, target_f))

    jax.config.update("jax_enable_x64", True)
    try:
        model = NeRFMLP(pos_freq=POS_FREQ, dir_freq=DIR_FREQ,
                        use_viewdirs=True, hidden_dim=HIDDEN,
                        num_layers=N_LAYERS)
        params0 = model.init(
            jax.random.key(0), jnp.zeros((1, 3)), jnp.zeros((1, 3))
        )["params"]
        params = import_nerf_mlp_state_dict(params0, tm.state_dict())

        # ---- torch oracle loop (reference train.py:274-287 semantics)
        opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
        t_losses = []
        for rays_o, rays_d, z_vals, target in batches:
            _, t_loss = tm(
                torch.from_numpy(rays_o), torch.from_numpy(rays_d),
                torch.from_numpy(z_vals), torch.from_numpy(target),
            )
            opt.zero_grad()
            t_loss.backward()
            opt.step()
            t_losses.append(float(t_loss.detach()))

        # ---- jax loop through the product optimizer
        tx = make_optimizer(
            OptimizerConfig(lr=LR, weight_decay=WD, kind="adam",
                            grad_clip=0.0),
            params,
        )
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, rays_o, rays_d, z_vals, target):
            def loss_fn(p):
                pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
                dirs = jnp.broadcast_to(rays_d[:, None], (R, S, 3))
                rgb, sigma = model.apply(
                    {"params": p}, pts.reshape(-1, 3), dirs.reshape(-1, 3)
                )
                out = volume_render(
                    rgb.reshape(R, S, 3), sigma.reshape(R, S), z_vals, rays_d
                )
                return jnp.mean((out.rgb - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        j_losses = []
        for rays_o, rays_d, z_vals, target in batches:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(rays_o), jnp.asarray(rays_d),
                jnp.asarray(z_vals), jnp.asarray(target),
            )
            j_losses.append(float(loss))
        params = jax.tree_util.tree_map(np.asarray, params)
    finally:
        jax.config.update("jax_enable_x64", False)

    # per-step loss trajectory parity (the pre-fix gradient bug class
    # produced O(0.5) relative errors — 8 orders beyond these bounds)
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-9, atol=1e-12)
    # the loop must actually be training, not comparing a fixed point
    assert t_losses[-1] < t_losses[0] * 0.9, "oracle loop did not descend"

    # final-parameter parity after N optimizer steps
    def check(j_arr, t_tensor, name):
        np.testing.assert_allclose(
            np.asarray(j_arr), t_tensor.detach().numpy(),
            rtol=1e-8, atol=1e-10, err_msg=f"{name} after loop",
        )

    for i in range(N_LAYERS):
        check(params[f"trunk_{i}"]["kernel"].T, tm.layers[i].weight,
              f"trunk_{i} kernel")
        check(params[f"trunk_{i}"]["bias"], tm.layers[i].bias,
              f"trunk_{i} bias")
    for head, t_lin in (("sigma_head", tm.sigma_out),
                        ("rgb_head", tm.rgb_out)):
        check(params[head]["kernel"].T, t_lin.weight, f"{head} kernel")
        check(params[head]["bias"], t_lin.bias, f"{head} bias")
