"""Pallas TPU kernels: VMEM-resident Cholesky factorization (f32 and dd32).

The factorization loop is sequential over columns with rank-1 trailing
updates — exactly the shape XLA handles worst (a while/fori carry that
bounces the (n, n) working set through HBM each step).  The Pallas kernel
pins the whole matrix in VMEM for all n steps: one HBM read, one write,
n rank-1 VPU updates in between (n <= ~700 in f32 / ~500 in dd fits the
~16 MB VMEM budget; IPM blocks are n ~ 100-500).

Both kernels are written for one (n, n) operand; batching comes from
`jax.vmap` over the `pallas_call` (the batch dim becomes a grid dim).
On non-TPU backends they run in interpreter mode (tests), so the same
code path is exercised everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD


@functools.cache
def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _f32_chol_body(n: int, M):
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def step(j, M):
        col = lax.dynamic_slice(M, (0, j), (n, 1))          # (n, 1)
        d = jnp.sqrt(lax.dynamic_slice(M, (j, j), (1, 1)))  # (1, 1)
        c = jnp.where(rows[:, :1] >= j, col / d, 0.0)
        M = jnp.where((rows > j) & (cols > j), M - c * c.T, M)
        M = jnp.where(cols == j, c, M)
        return M

    M = lax.fori_loop(0, n, step, M)
    return jnp.where(rows >= cols, M, 0.0)


def _f32_kernel(h_ref, l_ref):
    n = h_ref.shape[-1]
    l_ref[...] = _f32_chol_body(n, h_ref[...])


def cholesky_f32(H: jax.Array) -> jax.Array:
    """Lower Cholesky of one (n, n) SPD f32 matrix (vmap for batches)."""
    n = H.shape[-1]
    return pl.pallas_call(
        _f32_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), H.dtype),
        interpret=_interpret(),
    )(H)


def _dd_kernel(hi_ref, lo_ref, lhi_ref, llo_ref):
    n = hi_ref.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def step(j, carry):
        hi, lo = carry
        M = DD(hi, lo)
        col = DD(
            lax.dynamic_slice(hi, (0, j), (n, 1)),
            lax.dynamic_slice(lo, (0, j), (n, 1)),
        )
        d = ddm.sqrt(
            DD(
                lax.dynamic_slice(hi, (j, j), (1, 1)),
                lax.dynamic_slice(lo, (j, j), (1, 1)),
            )
        )
        c = ddm.div(col, d)
        rmask = rows[:, :1] >= j
        c = DD(jnp.where(rmask, c.hi, 0.0), jnp.where(rmask, c.lo, 0.0))
        upd = ddm.sub(M, ddm.mul(c, c.T))
        trail = (rows > j) & (cols > j)
        M = ddm.where(trail, upd, M)
        M = ddm.where(cols == j,
                      DD(c.hi + jnp.zeros_like(hi), c.lo + jnp.zeros_like(lo)),
                      M)
        return (M.hi, M.lo)

    hi, lo = lax.fori_loop(0, n, step, (hi_ref[...], lo_ref[...]))
    lower = rows >= cols
    lhi_ref[...] = jnp.where(lower, hi, 0.0)
    llo_ref[...] = jnp.where(lower, lo, 0.0)


def cholesky_dd(H: DD) -> DD:
    """Lower dd Cholesky of one (n, n) SPD dd matrix, fully VMEM-resident."""
    n = H.hi.shape[-1]
    hi, lo = pl.pallas_call(
        _dd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
        ),
        interpret=_interpret(),
    )(H.hi, H.lo)
    return DD(hi, lo)
