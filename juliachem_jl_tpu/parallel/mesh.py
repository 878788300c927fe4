"""Device mesh construction.

The TPU replacement for the reference's MPI rank topology (flat COMM_WORLD
with rank 0 as coordinator, SURVEY.md §2.3): a jax.sharding.Mesh with named
axes
  "q" — auxiliary-basis (Q) shards for the DF B tensor: the direct analog of
        the reference's aux partition across ranks x GPUs
        (DynamicLoad.jl:160-203, GPUDF.jl:1026-1056);
  "k" — secondary axis sharding exchange-matrix columns (tensor-parallel-like)
        used when a single q-shard row has multiple devices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices: int | None = None, k_axis: int = 1) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % k_axis != 0:
        raise ValueError(f"n_devices={n} not divisible by k_axis={k_axis}")
    arr = np.array(devs[:n]).reshape(n // k_axis, k_axis)
    return Mesh(arr, ("q", "k"))


def pad_to_multiple(x: np.ndarray, axis: int, multiple: int) -> np.ndarray:
    """Zero-pad one axis up to a multiple (even Q-shards: the analog of the
    reference's uneven Allgatherv + reorder, which SPMD avoids by padding)."""
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad)
