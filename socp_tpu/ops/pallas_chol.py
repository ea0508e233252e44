"""Pallas TPU kernels: VMEM-resident Cholesky / triangular solves.

The sequential column loops are exactly the shape XLA handles worst
(~12us of per-step kernel overhead, measured); pinning the working set in
VMEM inside ONE kernel is the only way past that floor.  All kernels are
validated in interpreter mode against the jnp reference implementations.

STATUS ON THE CURRENT TOOLCHAIN: the installed Mosaic lowering cannot
compile these for real TPUs — three independent blockers, each verified
2026-08-16 on jax 0.9.0:
  1. `lax.dynamic_slice` inside TC kernels: NotImplementedError;
  2. bool->f32 and f64 `convert_element_type`: the lowering rule calls
     itself through _convert_helper and recurses infinitely (hit even by
     an iota==j one-hot + dot inside fori_loop);
  3. `lax.optimization_barrier`: NotImplementedError — this one is fatal
     for ALL dd32 arithmetic, whose error-free transforms rely on the
     barrier to survive XLA's float simplifications (ops/dd.py).
The shipping TPU path therefore uses the XLA-compiled blocked kernels in
ops/dd_linalg.py; revisit when the toolchain's Mosaic gains these ops.

Batching: `jax.vmap` over the `pallas_call` (batch dim becomes a grid
dim).  Non-TPU backends run interpret mode, so tests exercise the same
code path everywhere.
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


def _tri_pair_kernel(lhi_ref, llo_ref, lthi_ref, ltlo_ref,
                     bhi_ref, blo_ref, xhi_ref, xlo_ref):
    """(L L')^-1 b for one (n, n) dd factor and (n, 1) dd rhs, fully
    VMEM-resident: the whole forward+backward substitution is ONE kernel
    (2n hardware-loop steps), vs ~2n XLA loop iterations each costing
    ~12us of per-step kernel overhead.  No dynamic indexing: column j is
    extracted with a one-hot matmul (exact — selection), the pivot with a
    masked sum, so nothing here needs the dynamic_slice lowering Mosaic
    lacks.  The backward pass reads columns of L' from the separately
    passed LT operand (no in-kernel transposes)."""
    n = lhi_ref.shape[0]
    L_hi, L_lo = lhi_ref[...], llo_ref[...]
    LT_hi, LT_lo = lthi_ref[...], ltlo_ref[...]
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def substitute(Mhi, Mlo, carry_hi, carry_lo, j, below):
        # explicit f32 constants: under x64 the literals would make this
        # f64, and Mosaic's f64 convert_element_type lowering recurses
        onehot = jnp.where(iota == j, jnp.float32(1.0), jnp.float32(0.0))
        col = DD(
            jnp.dot(Mhi, onehot, preferred_element_type=jnp.float32),
            jnp.dot(Mlo, onehot, preferred_element_type=jnp.float32),
        )
        B = DD(carry_hi, carry_lo)
        piv = DD(jnp.sum(col.hi * onehot, keepdims=True),
                 jnp.sum(col.lo * onehot, keepdims=True))  # (1, 1)
        bj = DD(jnp.sum(B.hi * onehot, keepdims=True),
                jnp.sum(B.lo * onehot, keepdims=True))
        xj = ddm.div(bj, piv)                              # (1, 1)
        is_j = iota == j
        B = ddm.where(is_j,
                      DD(xj.hi + jnp.zeros_like(B.hi),
                         xj.lo + jnp.zeros_like(B.lo)), B)
        mask = (iota > j) if below else (iota < j)
        zero = jnp.float32(0.0)
        coef = DD(jnp.where(mask, col.hi, zero),
                  jnp.where(mask, col.lo, zero))
        B = ddm.sub(B, ddm.mul(coef, xj))
        return B.hi, B.lo

    def fwd(j, carry):
        return substitute(L_hi, L_lo, carry[0], carry[1], j, below=True)

    def bwd(t, carry):
        return substitute(LT_hi, LT_lo, carry[0], carry[1], n - 1 - t,
                          below=False)

    hi, lo = lax.fori_loop(0, n, fwd, (bhi_ref[...], blo_ref[...]))
    hi, lo = lax.fori_loop(0, n, bwd, (hi, lo))
    xhi_ref[...] = hi
    xlo_ref[...] = lo


def tri_pair_solve(L: DD, LT: DD, b: DD) -> DD:
    """VMEM-resident (L L')^-1 b; b is (n, 1) dd.  vmap for batches."""
    n = L.hi.shape[-1]
    hi, lo = pl.pallas_call(
        _tri_pair_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(L.hi, L.lo, LT.hi, LT.lo, b.hi, b.lo)
    return DD(hi, lo)
