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


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Multi-host init (DCN): call once per process before any device query.

    Thin wrapper over ``jax.distributed.initialize`` so the CLI has a single
    entry point. Explicit args win; otherwise the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``,
    or a TPU metadata server) are used. Works on the CPU backend too (Gloo
    collectives) — the 2-process localhost smoke in tests/test_multihost.py
    runs exactly this path.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def process_local_slice(n_global: int) -> slice:
    """This process's contiguous row range of a globally-sharded ray batch
    (host-local data loading: each host materializes only its shard).

    ``n_global`` must divide evenly by the process count (the trainer pads
    batches to the mesh size already)."""
    pc = jax.process_count()
    assert n_global % pc == 0, (n_global, pc)
    per = n_global // pc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_batch(mesh: Mesh, local_arrays, axis_name: str = "data"):
    """Assemble globally-sharded device arrays from *host-local* numpy
    shards (one per array), sharded on the leading axis over ``mesh``.

    Single-process meshes skip the assembly (the local shard IS the global
    array). Multi-host: ``jax.make_array_from_process_local_data`` places
    each host's rows on its own devices — no cross-host data movement."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return tuple(jax.device_put(np.asarray(a), sharding)
                     for a in local_arrays)
    return tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in local_arrays
    )


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
