"""Profiling and debugging hooks.

The reference's only performance observability is wall-clock epoch prints
(SURVEY.md §5.1). Here: a `jax.profiler` trace context for capturing TPU
traces viewable in XProf/TensorBoard, a step-rate meter (rays/s — the
headline metric), and a NaN guard toggle.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a profiler trace for the enclosed block
    (`tensorboard --logdir` or XProf to view)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RateMeter:
    """Exponentially-smoothed rays/s meter for the training loop."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.rate: Optional[float] = None
        self._t: Optional[float] = None

    def tick(self, n_rays: int) -> Optional[float]:
        now = time.perf_counter()
        if self._t is not None:
            self.update(n_rays, now - self._t)
        self._t = now
        return self.rate

    def update(self, n_rays: int, seconds: float) -> float:
        """Fold an explicitly-timed interval into the EMA (used by the
        trainer, which times the train phase only — eval/checkpoint time
        between epochs must not pollute the rate)."""
        inst = n_rays / max(seconds, 1e-9)
        self.rate = (
            inst if self.rate is None
            else self.alpha * inst + (1 - self.alpha) * self.rate
        )
        return self.rate


def enable_nan_guard(enable: bool = True) -> None:
    """Globally re-run jitted computations de-optimized when a NaN appears
    and raise with the offending primitive (jax debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point JAX at a persistent compilation cache.

    The remote TPU compile service in this environment can be slow/queued
    (minutes per executable); caching serialized executables keeps repeat
    runs — the bench driver, re-trained configs, CI — off the compiler
    entirely. Defaults to `.jax_cache/` next to the repo root (same
    location bench.py seeds). Returns the directory used, or None if the
    cache could not be enabled (it is an optimization only, never fatal).
    """
    import os

    if cache_dir is None:
        cache_dir = os.environ.get("NERF_TPU_JAX_CACHE") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
