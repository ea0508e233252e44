"""Data-parallel batched solving: shard the instance axis over a device mesh.

The vmapped IPM body is purely instance-parallel (every op maps over the
batch dim; the only cross-instance communication is the while_loop's
any-active reduction), so sharding the inputs over a 1-D mesh lets XLA
partition the entire lockstep solve with one all-reduce of the loop
predicate per iteration — ICI traffic is a single bool per step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from socp_tpu import api
from socp_tpu.config import DEFAULT_CONFIG, SolverConfig
from socp_tpu.cones.layout import make_layout
from socp_tpu.problem import ConeDims


def solve_batch_sharded(
    c: np.ndarray,
    G: np.ndarray,
    h: np.ndarray,
    dims: ConeDims,
    mesh: Optional[Mesh] = None,
    A=None,
    b=None,
    P_mat=None,
    config: SolverConfig = DEFAULT_CONFIG,
    dtype=None,
):
    """Like api.solve_batch_raw but with the batch axis sharded over `mesh`.

    The batch size must be divisible by the mesh size.  Returns the same
    stacked-arrays tuple (host NumPy) as solve_batch_raw.
    """
    from socp_tpu.parallel.mesh import batch_mesh

    mesh = mesh or batch_mesh()
    (axis,) = mesh.axis_names
    ndev = mesh.devices.size
    B, n = np.shape(c)
    if B % ndev != 0:
        raise ValueError(f"batch {B} not divisible by mesh size {ndev}")

    dtype = dtype or api.default_dtype()
    layout = make_layout(dims, config.bucket_multiple)
    has_P = P_mat is not None
    batch_A = A is not None and np.ndim(A) == 3
    batch_P = has_P and np.ndim(P_mat) == 3
    if A is None:
        A, b = np.zeros((0, n)), np.zeros((0,))
    if P_mat is None:
        P_mat = np.zeros((0, 0))

    def put(arr, batched):
        arr = jnp.asarray(arr, dtype)
        spec = P(axis, *([None] * (arr.ndim - 1))) if batched else P()
        return jax.device_put(arr, NamedSharding(mesh, spec))

    cD = put(c, True)
    GD = put(layout.pad_rows(np.asarray(G, np.float64)), True)
    hD = put(layout.pad_vec(np.asarray(h, np.float64)), True)
    AD = put(A, batch_A)
    bD = put(b, batch_A)
    PD = put(P_mat, batch_P)

    fn = api._compiled(layout, config, has_P, batched=True, batch_A=batch_A,
                       batch_P=batch_P)
    x, y, s, z, status, k, stats, hist = fn(cD, GD, hD, AD, bD, PD)
    s = layout.unpad_vec(np.asarray(s, np.float64))
    z = layout.unpad_vec(np.asarray(z, np.float64))
    return (np.asarray(x, np.float64), np.asarray(y, np.float64), s, z,
            np.asarray(status), np.asarray(k), np.asarray(stats, np.float64),
            np.asarray(hist, np.float64))
