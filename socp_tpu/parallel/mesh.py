"""Device-mesh helpers (SURVEY.md 2.3: JAX collectives over ICI/DCN are the
framework's communication backend — there is no NCCL/MPI layer to port)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """1-D mesh over the first n devices for data-parallel (batched) solves."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def block_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    """1-D mesh for block-partitioned KKT (Schur reduction over ICI)."""
    return batch_mesh(n_devices, axis)


def shard_leading(mesh: Mesh, axis: str, *arrays):
    """Place arrays with their leading dim sharded over `axis` (rest replicated)."""
    out = []
    for a in arrays:
        spec = P(axis, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)
