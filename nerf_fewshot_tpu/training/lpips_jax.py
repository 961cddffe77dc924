"""LPIPS(VGG) in pure JAX.

The reference evaluates LPIPS via the ``lpips`` torch package with a
pretrained VGG16 backbone (reference: src/training/train.py:99-101,324-329,
inputs scaled to [-1,1]). This is a faithful port of that architecture so the
metric triple PSNR/SSIM/LPIPS is always produced, on-device:

* ScalingLayer: ``(x - shift) / scale`` with the lpips package's constants.
* VGG16 feature trunk (13 3×3 convs, 4 maxpools), tapped after
  relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3.
* Per-tap unit-normalization over channels (eps 1e-10), squared difference,
  1×1 no-bias linear head per tap, spatial mean, sum over taps — exactly the
  ``lpips.LPIPS(net='vgg')`` forward.

Pretrained weights are imported with :func:`load_torch_weights` when a
torchvision ``vgg16`` state_dict (and optionally the lpips linear heads) is
available on disk (searched by :func:`find_weight_files`). In zero-egress
environments without a weight cache the trunk is seeded-random (kaiming-style
fan-in scaling) and the linear heads are uniform ``1/C`` — a fixed, valid
perceptual distance (random-feature LPIPS is an established baseline: the
LPIPS paper's own random-network rows), but its absolute values differ from
the published pretrained-VGG numbers; ``pretrained`` reports which one ran.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 `features` layout: conv indices within the Sequential,
# and the channel plan. 'M' = 2×2/2 maxpool.
VGG16_PLAN: Tuple = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
    512, 512, 512, "M", 512, 512, 512,
)
# taps (0-based conv counter, exclusive) after relu1_2/2_2/3_3/4_3/5_3
TAP_AFTER_CONV = (2, 4, 7, 10, 13)
TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips ScalingLayer constants (lpips/lpips.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_params(seed: int = 0) -> Dict:
    """Deterministic parameter tree: 13 conv (kernel, bias) pairs in flax
    HWIO layout + 5 linear-head kernels (C, 1)."""
    rng = np.random.default_rng(seed)
    convs: List[Dict[str, np.ndarray]] = []
    c_in = 3
    for spec in VGG16_PLAN:
        if spec == "M":
            continue
        fan_in = 3 * 3 * c_in
        w = rng.standard_normal((3, 3, c_in, spec)).astype(np.float32)
        w *= np.sqrt(2.0 / fan_in)
        convs.append({"kernel": w, "bias": np.zeros(spec, np.float32)})
        c_in = spec
    lins = [
        {"kernel": np.full((c, 1), 1.0 / c, np.float32)} for c in TAP_CHANNELS
    ]
    return {
        "convs": [{k: jnp.asarray(v) for k, v in c.items()} for c in convs],
        "lins": [{k: jnp.asarray(v) for k, v in l.items()} for l in lins],
    }


def _vgg_taps(params: Dict, x: jnp.ndarray) -> List[jnp.ndarray]:
    """Run the VGG16 trunk on (H, W, 3), returning the five tap activations
    (each (h, w, c))."""
    h = x[None]  # NHWC
    taps = []
    conv_i = 0
    for spec in VGG16_PLAN:
        if spec == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
            continue
        p = params["convs"][conv_i]
        h = jax.lax.conv_general_dilated(
            h, p["kernel"], window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"]
        h = jax.nn.relu(h)
        conv_i += 1
        if conv_i in TAP_AFTER_CONV:
            taps.append(h[0])
        if conv_i == TAP_AFTER_CONV[-1]:
            break
    return taps


def _unit_normalize(f: jnp.ndarray) -> jnp.ndarray:
    """lpips normalize_tensor: divide by the channel-wise L2 norm."""
    norm = jnp.sqrt(jnp.sum(f**2, axis=-1, keepdims=True))
    return f / (norm + 1e-10)


def lpips_distance(params: Dict, img0: jnp.ndarray, img1: jnp.ndarray
                   ) -> jnp.ndarray:
    """LPIPS distance between two (H, W, 3) images in [-1, 1]."""
    x0 = (img0 - _SHIFT) / _SCALE
    x1 = (img1 - _SHIFT) / _SCALE
    taps0 = _vgg_taps(params, x0)
    taps1 = _vgg_taps(params, x1)
    total = jnp.zeros(())
    for t0, t1, lin in zip(taps0, taps1, params["lins"]):
        d = (_unit_normalize(t0) - _unit_normalize(t1)) ** 2  # (h, w, c)
        val = d @ lin["kernel"]  # 1×1 conv ≡ channel matmul, (h, w, 1)
        total = total + jnp.mean(val)
    return total


@functools.partial(jax.jit, static_argnums=())
def _jit_distance(params, img0, img1):
    return lpips_distance(params, img0, img1)


def load_torch_weights(
    params: Dict,
    vgg_state_dict: Optional[Dict] = None,
    lpips_state_dict: Optional[Dict] = None,
) -> Dict:
    """Merge pretrained weights into the param tree.

    ``vgg_state_dict``: torchvision ``vgg16().state_dict()`` (keys
    ``features.{i}.weight/bias``, torch OIHW conv layout). ``lpips_state_dict``:
    the lpips package's vgg head checkpoint (keys ``lin{k}.model.1.weight``,
    shape (1, C, 1, 1)). Either may be None; matching shapes are required.
    """
    out = {"convs": [dict(c) for c in params["convs"]],
           "lins": [dict(l) for l in params["lins"]]}
    if vgg_state_dict is not None:
        seq_idx = 0
        conv_i = 0
        for spec in VGG16_PLAN:
            if spec == "M":
                seq_idx += 1  # the pool layer
                continue
            wk, bk = f"features.{seq_idx}.weight", f"features.{seq_idx}.bias"
            if wk in vgg_state_dict:
                w = np.asarray(vgg_state_dict[wk])  # (out, in, kh, kw)
                b = np.asarray(vgg_state_dict[bk])
                if out["convs"][conv_i]["kernel"].shape == w.transpose(2, 3, 1, 0).shape:
                    out["convs"][conv_i]["kernel"] = jnp.asarray(
                        w.transpose(2, 3, 1, 0)
                    )
                    out["convs"][conv_i]["bias"] = jnp.asarray(b)
            seq_idx += 2  # conv + relu
            conv_i += 1
    if lpips_state_dict is not None:
        for k in range(5):
            key = f"lin{k}.model.1.weight"
            if key not in lpips_state_dict:
                key = f"lins.{k}.model.1.weight"
            if key in lpips_state_dict:
                w = np.asarray(lpips_state_dict[key])  # (1, C, 1, 1)
                out["lins"][k]["kernel"] = jnp.asarray(w[0, :, 0, 0][:, None])
    return out


def find_weight_files() -> Tuple[Optional[str], Optional[str]]:
    """Locate (vgg16_path, lpips_head_path) torch checkpoints on disk, if
    any: $NERF_LPIPS_VGG / $NERF_LPIPS_HEADS first, then the torch hub
    cache."""
    vgg = os.environ.get("NERF_LPIPS_VGG")
    heads = os.environ.get("NERF_LPIPS_HEADS")
    hub = os.path.join(
        os.environ.get("TORCH_HOME", os.path.expanduser("~/.cache/torch")),
        "hub", "checkpoints",
    )
    if vgg is None and os.path.isdir(hub):
        for name in sorted(os.listdir(hub)):
            if name.startswith("vgg16") and name.endswith(".pth"):
                vgg = os.path.join(hub, name)
                break
    return vgg, heads


class LPIPS:
    """Stateful wrapper: builds params once (pretrained when weights are on
    disk, seeded-random otherwise) and computes distances jitted."""

    def __init__(self, seed: int = 0):
        self.params = init_params(seed)
        self.pretrained = False
        vgg_path, heads_path = find_weight_files()
        if vgg_path is not None:
            try:  # pragma: no cover - depends on local weight cache
                import torch

                sd = torch.load(vgg_path, map_location="cpu")
                sd = {k: v.numpy() for k, v in sd.items()}
                heads = None
                if heads_path is not None:
                    heads = {
                        k: v.numpy()
                        for k, v in torch.load(
                            heads_path, map_location="cpu"
                        ).items()
                    }
                self.params = load_torch_weights(self.params, sd, heads)
                self.pretrained = True
            except Exception:
                pass

    def __call__(self, pred01, target01) -> float:
        """LPIPS between two (H, W, 3) images in [0, 1] (scaled to [-1, 1]
        internally, as the reference does — train.py:324-326)."""
        p = jnp.asarray(pred01, jnp.float32) * 2.0 - 1.0
        t = jnp.asarray(target01, jnp.float32) * 2.0 - 1.0
        return float(_jit_distance(self.params, p, t))
