"""Mesh construction and sharding helpers.

Thin wrappers over ``jax.sharding`` so the solver / FMM layers can annotate
their batched tensors without caring about device topology. All collectives
are left to GSPMD: we annotate leading-axis shardings on the big batched
tensors (FMM coefficient blocks, Schwarz leaf buckets, RHS columns) and XLA
partitions the einsums/scatters and inserts ICI collectives.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: int | None = None, axis_names=("sp",)) -> Mesh:
    """A 1D (or reshaped) device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if len(axis_names) == 1:
        shape = (n_devices,)
    else:
        # split factors as evenly as possible over the requested axes
        shape = []
        rem = n_devices
        for _ in axis_names[:-1]:
            f = _largest_factor_leq(rem, int(round(rem ** (1 / len(axis_names)))))
            shape.append(f)
            rem //= f
        shape.append(rem)
        shape = tuple(shape)
    return Mesh(devices.reshape(shape), axis_names)


def _largest_factor_leq(n: int, k: int) -> int:
    k = max(1, min(k, n))
    for f in range(k, 0, -1):
        if n % f == 0:
            return f
    return 1


def shard_leading_axis(mesh: Mesh, axis: str, x):
    """Shard an array (or pytree) over its leading axis along ``axis``."""

    def put(arr):
        if not hasattr(arr, "ndim") or arr.ndim == 0:
            return arr
        spec = PartitionSpec(axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, x)


def replicate(mesh: Mesh, x):
    """Fully replicate an array (or pytree) over the mesh."""

    def put(arr):
        if not hasattr(arr, "ndim"):
            return arr
        return jax.device_put(arr, NamedSharding(mesh, PartitionSpec()))

    return jax.tree_util.tree_map(put, x)
