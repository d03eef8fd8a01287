"""Device mesh construction for multi-chip / multi-host training.

The reference is single-GPU single-process (SURVEY.md §2.11); the TPU-native
scaling axes are:
  * ``data``  — view parallelism: each data group trains on different
    keyframes, parameter gradients are psum'd over ICI;
  * ``gauss`` — Gaussian-axis parallelism: the P dimension (params, Adam
    moments, preprocess) is sharded; compositing shards the *tile* axis over
    the same devices after an all_gather of the compact per-Gaussian
    rasterization state.

Collectives ride ICI within a slice (DCN across slices is handled by the
same axis layout — outer mesh dim maps to hosts).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_mesh(
    data: int = 1,
    gauss: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, gauss) mesh. ``gauss`` defaults to all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if gauss is None:
        assert n % data == 0, (n, data)
        gauss = n // data
    assert data * gauss == n, (data, gauss, n)
    arr = np.asarray(devices).reshape(data, gauss)
    return Mesh(arr, (DATA_AXIS, GAUSS_AXIS))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the Gaussian (capacity) axis; replicate across data."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
