"""Sinusoidal positional encoding.

Numerically matches the reference's two duplicated implementations
(reference: src/models/positional_encoding.py:5-33 and
src/models/nerf_mlp.py:6-39): feature ordering is
``[x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...]`` with each term being
the full input dimension, and frequency bands ``2**linspace(0, F-1, F)`` (log
sampling, the default) or ``linspace(1, 2**(F-1), F)`` (linear sampling).

The ordering matters for checkpoint parity with the reference, so it is pinned
by tests against a torch oracle.

TPU notes: the encoding is a pure VPU op; at the call sites it is either fused
by XLA into the first MLP matmul's producer or computed inside the Pallas
ray-tile kernel so the encoded points never round-trip to HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def _freq_bands(num_freqs: int, log_sampling: bool, dtype) -> jnp.ndarray:
    if log_sampling:
        return 2.0 ** jnp.linspace(0.0, num_freqs - 1, num_freqs, dtype=dtype)
    return jnp.linspace(1.0, 2.0 ** (num_freqs - 1), num_freqs, dtype=dtype)


def posenc_output_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    """Output feature dimension (reference: src/models/nerf_mlp.py:35-39)."""
    dim = input_dim * 2 * num_freqs
    if include_input:
        dim += input_dim
    return dim


def positional_encoding(
    x: jnp.ndarray,
    num_freqs: int = 10,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """Encode ``x`` of shape (..., D) to (..., D*(2*num_freqs [+1]))."""
    # Broadcast-friendly implementation without vectorize overhead:
    freqs = _freq_bands(num_freqs, log_sampling, x.dtype)
    phases = x[..., None, :] * freqs[:, None]  # (..., F, D)
    sin = jnp.sin(phases)
    cos = jnp.cos(phases)
    # (..., F, 2, D) -> (..., F*2*D): per-frequency [sin(D), cos(D)] blocks.
    enc = jnp.stack([sin, cos], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, enc], axis=-1)
    return enc
