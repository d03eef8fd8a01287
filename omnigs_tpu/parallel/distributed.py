"""Multi-host execution: process-spanning meshes + host-local data.

The reference is strictly single-process (SURVEY.md §2.11); this is the
BASELINE config-5 axis ("Gaussians/views sharded over a pod slice"). Design:

* `initialize()` wraps `jax.distributed.initialize` (env-var driven, no-op
  for one process). After it, `jax.devices()` spans all hosts and the
  (data, gauss) mesh from `make_mesh` is process-spanning: the **data axis
  is outermost**, so view-parallel gradient psums cross DCN once per step
  while Gaussian-axis collectives (all_gather of raster state) stay on ICI
  within a host's devices.
* Each process loads only the keyframe images for the data rows its local
  devices own (`local_data_rows`); per-step batches are assembled with
  `jax.make_array_from_process_local_data`, so no image bytes ever cross
  hosts — only gradients do.
* The keyframe *sampler* runs identically on every process (same seed, same
  sequence), which keeps processes lock-step without a control channel: a
  process materializes images only for its own rows.

Validated by tests/test_multihost.py: two coordinated CPU processes train
lock-step with losses identical to the single-process mesh run.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np

from omnigs_tpu.parallel.mesh import DATA_AXIS, make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process runtime (idempotent; no-op single-process).

    Falls back to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) when args are omitted — the same
    contract as `jax.distributed.initialize`, but skipping entirely when
    neither is present so single-host entry points need no flags.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or (num_processes or 1) <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(data: int = 1, gauss: Optional[int] = None):
    """(data, gauss) mesh over ALL processes' devices, data outermost.

    `jax.devices()` enumerates process-major, so consecutive data rows land
    on the same host when data ≥ process count — view-gradient psums are
    the only DCN traffic.
    """
    return make_mesh(data=data, gauss=gauss, devices=jax.devices())


def data_row_owner(mesh) -> List[int]:
    """Owning process index per data row (row d → devices[d, :])."""
    dev = np.asarray(mesh.devices)
    return [int(dev[d, 0].process_index) for d in range(dev.shape[0])]


def local_data_rows(mesh) -> List[int]:
    """Data rows whose devices live on THIS process."""
    me = jax.process_index()
    return [d for d, p in enumerate(data_row_owner(mesh)) if p == me]


def data_batch(mesh, local_rows_data: np.ndarray):
    """Assemble a (D, ...) data-axis-sharded global array from this
    process's rows only (host-local data loading).

    ``local_rows_data`` is (len(local_data_rows(mesh)), ...) stacked in row
    order. Other processes contribute their own rows; no host ever holds
    the full batch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    n_data = np.asarray(mesh.devices).shape[0]
    global_shape = (n_data,) + tuple(local_rows_data.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows_data), global_shape
    )


def replicate_from_host(mesh, value: np.ndarray, pspec=None):
    """Place a host-replicated numpy value as a global array with the given
    PartitionSpec (default fully replicated). Works across processes —
    unlike `jax.device_put`, which rejects shardings spanning non-addressable
    devices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, pspec if pspec is not None else P())
    value = np.asarray(value)
    return jax.make_array_from_callback(
        value.shape, sharding, lambda idx: value[idx]
    )


def data_batch_seq(mesh, local_seq: np.ndarray):
    """(K, D, ...) fused-window batch sharded on axis 1 (data) from this
    process's rows only: ``local_seq`` is (K, n_local_rows, ...)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    n_data = np.asarray(mesh.devices).shape[0]
    global_shape = (
        local_seq.shape[0],
        n_data * local_seq.shape[1] // max(len(local_data_rows(mesh)), 1),
    ) + tuple(local_seq.shape[2:])
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_seq), global_shape
    )
