"""Data-parallel training over a JAX device mesh.

The reference has no distributed backend of any kind (single MPS/CPU device,
SURVEY.md §2.3); every capability here is net-new and TPU-native:

* Strategy: **ray-batch data parallelism.** The NeRF MLP is ~0.6 MB of
  parameters — replicate params, shard the ray batch (and its per-ray sample
  axis stays chip-local). Gradients are combined by XLA-inserted collectives
  (``psum`` over ICI) when the jitted step's output sharding demands
  replicated grads; XLA overlaps the all-reduce with the tail of the
  backward pass.
* Mechanism: ``jax.jit`` with ``NamedSharding`` in/out specs over a 1-D
  ``Mesh(('data',))``. Multi-host extends the same mesh across processes via
  ``jax.distributed.initialize()`` (see ``initialize_multihost``); each host
  feeds its local shard of the ray batch (host-local data loading).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data", devices=None
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def initialize_multihost(**kwargs) -> None:  # pragma: no cover - needs cluster
    """Multi-host init (DCN): call once per process before device use.

    Thin wrapper over ``jax.distributed.initialize`` so the CLI has a single
    entry point; coordinator address/process counts come from env or kwargs.
    """
    jax.distributed.initialize(**kwargs)


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (ray-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def data_parallel_train_step(
    step_fn: Callable,
    mesh: Mesh,
    batch_argnums: Sequence[int],
    donate_argnums: Tuple[int, ...] = (0, 1),
    axis_name: str = "data",
) -> Callable:
    """Wrap a pure train step ``(params, opt_state, *args) -> (params,
    opt_state, aux)`` with DP shardings: listed batch args sharded on their
    leading axis, everything else (params, opt state, keys, scalars)
    replicated; outputs replicated — which makes XLA insert the gradient
    all-reduce automatically."""
    import inspect

    n_args = len(inspect.signature(step_fn).parameters)
    data_s = shard_batch(mesh, axis_name)
    repl = replicate(mesh)
    in_shardings = tuple(
        data_s if i in set(batch_argnums) else repl for i in range(n_args)
    )
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=repl,
        donate_argnums=donate_argnums,
    )
