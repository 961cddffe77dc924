"""Test configuration: force JAX onto a virtual 8-device CPU platform.

This environment pre-imports jax via a sitecustomize hook that registers a
remote TPU backend (JAX_PLATFORMS=axon), so env vars set here are too late —
instead we (1) extend XLA_FLAGS before any backend is *initialized* so the
CPU client exposes 8 virtual devices for sharding tests (SURVEY.md §4 test
strategy (c)), and (2) switch the platform through jax.config, which wins as
long as no computation has run yet.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (already imported by sitecustomize; config still mutable)

# NERF_TPU_TESTS=1 keeps the default (TPU) backend so the on-chip numerics
# pins in test_tpu_numerics.py actually run: e.g.
#   NERF_TPU_TESTS=1 python -m pytest tests/test_tpu_numerics.py -q
if not os.environ.get("NERF_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
