"""ctypes bindings for the native host-side data path.

Builds ``libnerf_native.so`` from the in-tree C++ source on first use (g++,
cached next to the source); every entry point transparently falls back to the
numpy/jnp implementation when the toolchain or the build is unavailable, and
parity between both paths is pinned by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nerf_native.cpp")
_LIB = os.path.join(_DIR, "libnerf_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            if (not os.path.exists(_LIB)) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-pthread", _SRC, "-o", _LIB,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            f32p = ctypes.POINTER(ctypes.c_float)
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.nerf_get_rays.argtypes = [
                ctypes.c_int32, ctypes.c_int32, ctypes.c_float, f32p, f32p, f32p
            ]
            lib.nerf_composite_white.argtypes = [f32p, ctypes.c_int64, f32p]
            lib.nerf_resize_bilinear.argtypes = [
                f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                f32p, ctypes.c_int32, ctypes.c_int32,
            ]
            lib.nerf_gather_batch.argtypes = [
                f32p, f32p, f32p, i64p, ctypes.c_int64, ctypes.c_int64,
                f32p, f32p, f32p,
            ]
            _lib = lib
            return _lib
        except Exception:
            _build_failed = True
            return None


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def get_rays(H: int, W: int, focal: float, c2w: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W, 3) ray origins/directions; native or numpy fallback."""
    lib = _load()
    c2w = np.ascontiguousarray(c2w, dtype=np.float32)
    if lib is not None:
        rays_o = np.empty((H, W, 3), np.float32)
        rays_d = np.empty((H, W, 3), np.float32)
        lib.nerf_get_rays(H, W, float(focal), _fp(c2w), _fp(rays_o), _fp(rays_d))
        return rays_o, rays_d
    i = np.arange(W, dtype=np.float32)[None, :]
    j = np.arange(H, dtype=np.float32)[:, None]
    dirs = np.stack(
        [
            np.broadcast_to((i - W * 0.5) / focal, (H, W)),
            np.broadcast_to(-(j - H * 0.5) / focal, (H, W)),
            -np.ones((H, W), np.float32),
        ],
        axis=-1,
    )
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).copy()
    return rays_o, rays_d.astype(np.float32)


def composite_white(rgba: np.ndarray) -> np.ndarray:
    """(..., 4) RGBA [0,1] → (..., 3) RGB over white."""
    lib = _load()
    shape = rgba.shape[:-1]
    flat = np.ascontiguousarray(rgba, np.float32).reshape(-1, 4)
    if lib is not None:
        out = np.empty((flat.shape[0], 3), np.float32)
        lib.nerf_composite_white(_fp(flat), flat.shape[0], _fp(out))
        return out.reshape(*shape, 3)
    a = flat[:, 3:4]
    return (flat[:, :3] * a + (1.0 - a)).reshape(*shape, 3)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """torch-interpolate-bilinear (align_corners=False) resize of (H,W,C)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    H, W, C = img.shape
    if lib is not None:
        out = np.empty((out_h, out_w, C), np.float32)
        lib.nerf_resize_bilinear(_fp(img), H, W, C, _fp(out), out_h, out_w)
        return out
    from nerf_fewshot_tpu.ops.interp import resize_bilinear as jnp_resize

    return np.asarray(jnp_resize(img, out_h, out_w))


def gather_batch(
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    targets: np.ndarray,
    idx: np.ndarray,
    batch: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather (and pad to ``batch``) ray/target rows for one training step."""
    lib = _load()
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is not None:
        oo = np.empty((batch, 3), np.float32)
        od = np.empty((batch, 3), np.float32)
        ot = np.empty((batch, 3), np.float32)
        lib.nerf_gather_batch(
            _fp(np.ascontiguousarray(rays_o, np.float32)),
            _fp(np.ascontiguousarray(rays_d, np.float32)),
            _fp(np.ascontiguousarray(targets, np.float32)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0], batch, _fp(oo), _fp(od), _fp(ot),
        )
        return oo, od, ot
    pad_idx = np.concatenate(
        [idx, np.zeros(batch - idx.shape[0], np.int64)]
    ) if idx.shape[0] < batch else idx[:batch]
    return (
        np.asarray(rays_o, np.float32)[pad_idx],
        np.asarray(rays_d, np.float32)[pad_idx],
        np.asarray(targets, np.float32)[pad_idx],
    )
