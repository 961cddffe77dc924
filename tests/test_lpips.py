"""LPIPS(VGG) JAX port vs a hand-written torch oracle of the lpips package's
architecture (reference consumes ``lpips.LPIPS(net='vgg')``,
src/training/train.py:99-101,324-329): ScalingLayer → VGG16 taps at
relu{1_2,2_2,3_3,4_3,5_3} → channel unit-norm → squared diff → 1×1 no-bias
heads → spatial mean → sum."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from nerf_fewshot_tpu.training.lpips_jax import (
    TAP_AFTER_CONV,
    VGG16_PLAN,
    init_params,
    load_torch_weights,
    lpips_distance,
)
from nerf_fewshot_tpu.training.metrics import LPIPSMetric

RNG = np.random.default_rng(11)

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_taps(params, x):
    """VGG16 trunk in torch from the jax param tree (HWIO → OIHW)."""
    h = x
    taps = []
    conv_i = 0
    for spec in VGG16_PLAN:
        if spec == "M":
            h = F.max_pool2d(h, 2, 2)
            continue
        w = torch.from_numpy(
            np.asarray(params["convs"][conv_i]["kernel"]).transpose(3, 2, 0, 1)
        )
        b = torch.from_numpy(np.asarray(params["convs"][conv_i]["bias"]))
        h = F.relu(F.conv2d(h, w, b, padding=1))
        conv_i += 1
        if conv_i in TAP_AFTER_CONV:
            taps.append(h)
        if conv_i == TAP_AFTER_CONV[-1]:
            break
    return taps


def _torch_lpips(params, img0, img1):
    """The lpips package's forward, in torch, on (H, W, 3) [-1,1] inputs."""
    x0 = torch.from_numpy(img0).permute(2, 0, 1)[None]
    x1 = torch.from_numpy(img1).permute(2, 0, 1)[None]
    t0 = _torch_taps(params, (x0 - SHIFT) / SCALE)
    t1 = _torch_taps(params, (x1 - SHIFT) / SCALE)
    total = 0.0
    for a, b, lin in zip(t0, t1, params["lins"]):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        w = torch.from_numpy(np.asarray(lin["kernel"]))  # (C, 1)
        val = torch.einsum("nchw,co->nohw", d, w)
        total = total + val.mean()
    return float(total)


def test_lpips_matches_torch_oracle():
    params = init_params(seed=0)
    a = RNG.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    b = RNG.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    got = float(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    want = _torch_lpips(params, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_lpips_metric_properties():
    m = LPIPSMetric()
    assert m.available
    a = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    d_ab = m(a, b)
    assert d_ab is not None and np.isfinite(d_ab) and d_ab > 0
    assert abs(m(a, a)) < 1e-6  # identity
    np.testing.assert_allclose(m(b, a), d_ab, rtol=1e-5)  # symmetry
    # a slightly-perturbed image is closer than an unrelated one
    a2 = np.clip(a + 0.01 * RNG.standard_normal(a.shape).astype(np.float32), 0, 1)
    assert m(a, a2) < d_ab


def test_torch_weight_import_mapping():
    """features.{i}.weight (OIHW) and lin{k}.model.1.weight (1,C,1,1) map
    into the tree and change the computation accordingly."""
    params = init_params(seed=0)
    # fake torchvision vgg16 state_dict with the correct Sequential indices
    sd = {}
    seq_idx = 0
    c_in = 3
    rng = np.random.default_rng(5)
    for spec in VGG16_PLAN:
        if spec == "M":
            seq_idx += 1
            continue
        sd[f"features.{seq_idx}.weight"] = rng.standard_normal(
            (spec, c_in, 3, 3)
        ).astype(np.float32) * 0.05
        sd[f"features.{seq_idx}.bias"] = rng.standard_normal(spec).astype(
            np.float32
        ) * 0.01
        seq_idx += 2
        c_in = spec
    heads = {
        f"lin{k}.model.1.weight": rng.uniform(
            0, 0.1, (1, c, 1, 1)
        ).astype(np.float32)
        for k, c in enumerate((64, 128, 256, 512, 512))
    }
    loaded = load_torch_weights(params, sd, heads)
    # imported weights present (HWIO transpose of OIHW)
    np.testing.assert_allclose(
        np.asarray(loaded["convs"][0]["kernel"]),
        sd["features.0.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(loaded["lins"][3]["kernel"])[:, 0],
        heads["lin3.model.1.weight"][0, :, 0, 0],
    )
    # and the oracle still agrees on the imported tree
    a = RNG.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    b = RNG.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    got = float(lpips_distance(loaded, jnp.asarray(a), jnp.asarray(b)))
    want = _torch_lpips(loaded, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
