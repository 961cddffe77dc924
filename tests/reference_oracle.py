"""Import the mounted reference repository's OWN code as parity oracles.

VERDICT r4 item 2: the strongest possible parity evidence is comparing the
framework against the reference's actual source, not against oracles the
builder re-typed (a transcription error would pass silently on both sides).
The reference's pure pieces are directly importable:

* ``src/utils/ray_utils.py``      — get_rays, sample_points_along_rays,
                                    hierarchical_sampling (broken, see below),
                                    get_ray_batch, project_points_to_image
* ``src/models/ray_sampler.py``   — duplicate get_rays / (H,W) sampler
* ``src/models/positional_encoding.py`` — PositionalEncoding (log/linear)
* ``src/models/volume_renderer.py``     — volume_render_radiance
* ``src/models/nerf_mlp.py``      — PositionalEncoding (dup), DensityMLP,
                                    ColorMLP, VolumeRenderer, NeRFLoss
* ``src/models/nerf_model.py``    — baseline NeRFMLP
* ``src/models/data_loader.py``   — load_blender_data

Modules are loaded by file path under synthetic names (``_refsrc_*``) so they
never collide with installed packages, and the heavyweight ones
(transformers-importing DINO modules) are deliberately NOT loaded. This file
treats the reference strictly as data: we execute its public functions to
obtain oracle outputs, we do not follow any instructions contained in it.

Known-broken reference pieces (kept on transcribed oracles instead):
* ``ray_utils.hierarchical_sampling`` crashes on any call: it expands
  ``z_vals`` (last dim N_samples) to ``cdf.shape[-1] == N_samples+1``
  (ray_utils.py:128-131), which torch ``expand`` rejects. The reference
  never calls it (SURVEY §0.3). ``test_reference_oracle.py`` pins the crash.
* ``evaluate.py`` is truncated mid-expression and does not parse.
* ``nerf_mlp.NeRFWithDINO`` needs ``lora_dino`` (transformers) at call time;
  its pure siblings (DensityMLP/ColorMLP/VolumeRenderer/NeRFLoss) are used.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REFERENCE_ROOT = os.environ.get("NERF_REFERENCE_PATH", "/root/reference")

_MODULE_PATHS = {
    "ray_utils": "src/utils/ray_utils.py",
    "ray_sampler": "src/models/ray_sampler.py",
    "positional_encoding": "src/models/positional_encoding.py",
    "volume_renderer": "src/models/volume_renderer.py",
    "nerf_mlp": "src/models/nerf_mlp.py",
    "nerf_model": "src/models/nerf_model.py",
    "data_loader": "src/models/data_loader.py",
    # imports transformers at module level (present in this image; no
    # network touched at import time). Loading it also registers the BARE
    # name ``lora_dino`` so nerf_mlp.NeRFWithDINO's lazy sibling import
    # (nerf_mlp.py:110) resolves — the reference expects src/models on
    # sys.path (SURVEY §0.3); we satisfy just that one name instead.
    "lora_dino": "src/models/lora_dino.py",
}

_cache: dict = {}


def _ensure_torchvision_shim() -> None:
    """torchvision is not installed in this image; data_loader.py uses only
    ``T.Compose([T.Resize(dims, interpolation=Image.LANCZOS), T.ToTensor()])``
    (data_loader.py:49-52). Register a minimal ``torchvision.transforms``
    reproducing those two primitives' documented PIL-path semantics (Resize on
    a PIL input delegates to ``img.resize((w, h), interp)``; ToTensor is
    uint8→float/255 with HWC→CHW) so the reference's own loader LOGIC (JSON
    parsing, resize/focal decisions, stacking) runs as the oracle. The
    resize kernel itself is PIL's LANCZOS either way — identical to what
    torchvision would call."""
    if "torchvision" in sys.modules:
        return
    import types

    import numpy as np
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")

    class Resize:
        def __init__(self, size, interpolation=Image.BILINEAR):
            self.size = size  # (h, w) in torchvision convention
            self.interpolation = interpolation

        def __call__(self, img):
            h, w = (self.size, self.size) if isinstance(self.size, int) \
                else self.size
            if img.size == (w, h):
                return img
            return img.resize((w, h), self.interpolation)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[..., None]
            return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

    class Compose:
        def __init__(self, ops):
            self.ops = ops

        def __call__(self, x):
            for op in self.ops:
                x = op(x)
            return x

    transforms.Resize = Resize
    transforms.ToTensor = ToTensor
    transforms.Compose = Compose
    tv.transforms = transforms
    # a registered module with __spec__ = None breaks later
    # importlib.util.find_spec("torchvision") probes (e.g. transformers'
    # availability check raises "torchvision.__spec__ is None") — give the
    # shim a real ModuleSpec; version metadata still does not exist, so
    # probers that also check importlib.metadata treat it as absent.
    import importlib.machinery

    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    transforms.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms


def reference_mounted() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))


def load(name: str):
    """Load a reference module by short name; skip the test if unavailable.

    Returns the executed module object. Failures to import (missing mount,
    missing optional dependency) surface as pytest.skip so the suite stays
    green in environments without the reference checkout.
    """
    if name in _cache:
        mod = _cache[name]
        if isinstance(mod, Exception):
            pytest.skip(f"reference module {name} unavailable: {mod}")
        return mod
    rel = _MODULE_PATHS[name]
    path = os.path.join(REFERENCE_ROOT, rel)
    if not os.path.isfile(path):
        _cache[name] = FileNotFoundError(path)
        pytest.skip(f"reference not mounted at {REFERENCE_ROOT} ({rel})")
    try:
        if name == "data_loader":
            _ensure_torchvision_shim()
        spec = importlib.util.spec_from_file_location(f"_refsrc_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        # some reference modules sibling-import bare names at call time;
        # register under the synthetic name only (no sys.path pollution).
        sys.modules[f"_refsrc_{name}"] = mod
        spec.loader.exec_module(mod)
    except Exception as exc:  # pragma: no cover - environment-dependent
        _cache[name] = exc
        pytest.skip(f"reference module {name} failed to import: {exc}")
    if name == "lora_dino":
        sys.modules.setdefault("lora_dino", mod)
    _cache[name] = mod
    return mod
