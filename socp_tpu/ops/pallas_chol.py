"""Pallas TPU kernels: VMEM-resident Cholesky / triangular solves.

The sequential column loops of a factorization/substitution are exactly the
shape XLA handles worst on TPU (~12us of per-step dispatch overhead,
measured — see ops/dd_linalg.py); pinning the working set in VMEM inside
ONE kernel removes that floor: the whole O(n) step sequence is a single
hardware loop.

Mosaic-compatibility rules (all verified on hardware, jax 0.9.0, via
scripts/pallas_probe.py — round 1 wrongly concluded these kernels could
not compile):
  * NO `lax.dynamic_slice`: columns are extracted with a one-hot masked
    VPU reduction.  (An MXU dot against a one-hot is NOT safe: TPU f32
    matmuls run as truncated-bf16 passes — measured 3e-3 error.)
  * NO bool/f64 `convert_element_type`: every literal is jnp.float32,
    masks only feed jnp.where, and fori_loop bounds are int32 (under x64
    the default i64 counter's comparisons against int32 iota recurse in
    Mosaic's convert helper).
  * NO `lax.optimization_barrier`: dd arithmetic is traced under
    `ddm.barrier_free()` — Mosaic's MLIR pipeline does not re-associate
    floats, so the raw error-free transforms compile exactly (verified
    bit-exact vs f64 on hardware).  Interpret mode keeps the barriers
    (see _dd_trace_ctx: the host backend DOES re-associate).

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


def _dd_trace_ctx():
    """Barrier-free dd tracing ONLY when compiling for TPU: in interpret
    mode the kernel runs through the host backend, where stripping the
    optimization barriers would let XLA's simplifier destroy the
    error-free transforms whenever the f64 fallback is off (x64 disabled).
    Mosaic needs barrier-free (can't lower the barrier) and is safe
    (doesn't re-associate); the interpreter is the reverse."""
    import contextlib

    return contextlib.nullcontext() if _interpret() else ddm.barrier_free()


def _i32(v) -> jax.Array:
    return jnp.int32(v)


# ---------------------------------------------------------------------------
# f32 Cholesky
# ---------------------------------------------------------------------------

def _f32_chol_kernel(h_ref, l_ref):
    n = h_ref.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(j, M):
        sel = jnp.where(iota.T == j, jnp.float32(1.0), jnp.float32(0.0))
        col = jnp.sum(M * sel, axis=1, keepdims=True)           # (n, 1)
        piv = jnp.sum(col * sel.T)
        d = jnp.sqrt(piv)
        c = jnp.where(iota >= j, col / d, jnp.float32(0.0))
        M = jnp.where((rows > j) & (cols > j), M - c * c.T, M)
        M = jnp.where(cols == j, c, M)
        return M

    M = lax.fori_loop(_i32(0), _i32(n), step, h_ref[...])
    l_ref[...] = jnp.where(rows >= cols, M, jnp.float32(0.0))


def cholesky_f32(H: jax.Array) -> jax.Array:
    """Lower Cholesky of one (n, n) SPD f32 matrix (vmap for batches).

    Compiled on TPU (verified ~6e-7 relative reconstruction at n=128);
    interpret mode elsewhere."""
    n = H.shape[-1]
    return pl.pallas_call(
        _f32_chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        interpret=_interpret(),
    )(H.astype(jnp.float32))


# ---------------------------------------------------------------------------
# f32 triangular pair solve (forward + backward), k RHS columns
# ---------------------------------------------------------------------------

def _f32_tri_kernel(l_ref, lt_ref, b_ref, x_ref):
    """Each step reads ONE row of the factor via a dynamic ref slice
    (pl.ds lowers to address arithmetic — O(n) traffic per step), not a
    masked extraction from the full matrix (O(n^2) per step, the cost
    driver of the first kernel version).  The RHS rides TRANSPOSED as
    (k, n) so the solve dimension n spans the 128-lane axis — an (n, 1)
    column layout uses 1 of 128 lanes per VPU op.  The forward pass reads
    rows of LT (= columns of L); the backward pass rows of L."""
    n = l_ref.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def substitute(m_ref, B, j, below):
        col = m_ref[pl.ds(j, 1), :]                             # (1, n)
        sel = jnp.where(iota == j, jnp.float32(1.0), jnp.float32(0.0))
        piv = jnp.sum(col * sel)                                # scalar
        bj = jnp.sum(B * sel, axis=1, keepdims=True)            # (k, 1)
        xj = bj / piv
        B = jnp.where(iota == j, xj, B)
        mask = (iota > j) if below else (iota < j)
        coef = jnp.where(mask, col, jnp.float32(0.0))           # (1, n)
        return B - xj * coef

    def fwd(j, B):
        return substitute(lt_ref, B, j, below=True)

    def bwd(t, B):
        return substitute(l_ref, B, _i32(n - 1) - t, below=False)

    B = lax.fori_loop(_i32(0), _i32(n), fwd, b_ref[...])
    B = lax.fori_loop(_i32(0), _i32(n), bwd, B)
    x_ref[...] = B


def tri_solve_f32(L: jax.Array, LT: jax.Array, B: jax.Array) -> jax.Array:
    """(L L')^-1 B for one (n, n) f32 factor and (n, k) rhs, VMEM-resident:
    the whole forward+backward substitution is ONE kernel (2n hardware-loop
    steps) instead of ~2n XLA dispatches."""
    n, k = B.shape
    xt = pl.pallas_call(
        _f32_tri_kernel,
        out_shape=jax.ShapeDtypeStruct((k, n), jnp.float32),
        interpret=_interpret(),
    )(L.astype(jnp.float32), LT.astype(jnp.float32), B.astype(jnp.float32).T)
    return xt.T


# ---------------------------------------------------------------------------
# dd32 Cholesky
# ---------------------------------------------------------------------------

def _dd_chol_kernel(hi_ref, lo_ref, lhi_ref, llo_ref):
    """Right-looking dd Cholesky with the working matrix IN the output
    refs: column j of the (symmetric) trailing block is read as ROW j via
    one dynamic ref slice (entries k < j hold already-written L columns
    and are masked off) — O(n) extraction instead of an O(n^2) masked
    scan; the rank-1 trailing update is the remaining real O(n^2)/step."""
    n = hi_ref.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    iota_r = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    zero = jnp.float32(0.0)

    lhi_ref[...] = hi_ref[...]
    llo_ref[...] = lo_ref[...]

    def step(j, _):
        row = DD(lhi_ref[pl.ds(j, 1), :], llo_ref[pl.ds(j, 1), :])  # (1, n)
        sel = jnp.where(iota_r == j, jnp.float32(1.0), zero)
        piv = DD(jnp.sum(row.hi * sel, keepdims=True),
                 jnp.sum(row.lo * sel, keepdims=True))          # (1, 1)
        d = ddm.sqrt(piv)
        cmask = iota_r >= j
        crow = ddm.div(
            DD(jnp.where(cmask, row.hi, zero), jnp.where(cmask, row.lo, zero)),
            d,
        )                                                       # (1, n)
        c = DD(crow.hi.T, crow.lo.T)                            # (n, 1)
        M = DD(lhi_ref[...], llo_ref[...])
        upd = ddm.sub(M, ddm.mul(c, crow))
        trail = (rows > j) & (cols > j)
        M = ddm.where(trail, upd, M)
        M = ddm.where(cols == j,
                      DD(c.hi + jnp.zeros_like(M.hi),
                         c.lo + jnp.zeros_like(M.lo)), M)
        lhi_ref[...] = M.hi
        llo_ref[...] = M.lo
        return _i32(0)

    # carry must be i32: a weak Python 0 promotes to i64 under x64, and
    # Mosaic cannot legalize an i64 func.return (verified on hardware)
    lax.fori_loop(_i32(0), _i32(n), step, _i32(0))
    lower = rows >= cols
    lhi_ref[...] = jnp.where(lower, lhi_ref[...], zero)
    llo_ref[...] = jnp.where(lower, llo_ref[...], zero)


def cholesky_dd(H: DD) -> DD:
    """Lower dd Cholesky of one (n, n) SPD dd matrix, fully VMEM-resident."""
    n = H.hi.shape[-1]
    with _dd_trace_ctx():
        hi, lo = pl.pallas_call(
            _dd_chol_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n, n), jnp.float32),
                jax.ShapeDtypeStruct((n, n), jnp.float32),
            ),
            interpret=_interpret(),
        )(H.hi, H.lo)
    return DD(hi, lo)


# ---------------------------------------------------------------------------
# dd32 triangular pair solve, k RHS columns
# ---------------------------------------------------------------------------

def _tri_pair_kernel(lhi_ref, llo_ref, lthi_ref, ltlo_ref,
                     bhi_ref, blo_ref, xhi_ref, xlo_ref):
    """(L L')^-1 B for one (n, n) dd factor and (k, n) TRANSPOSED dd rhs,
    fully VMEM-resident.  Each step reads ONE row of the factor via a
    dynamic ref slice (O(n) traffic), and the rhs rides as (k, n) row
    vectors so the solve dimension n spans the 128-lane axis — an (n, 1)
    column layout uses 1 of 128 lanes per VPU op.  The forward pass reads
    rows of LT (= columns of L), the backward pass rows of L (= columns
    of L')."""
    n = lhi_ref.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    zero = jnp.float32(0.0)

    def substitute(mhi_ref, mlo_ref, carry_hi, carry_lo, j, below):
        col = DD(mhi_ref[pl.ds(j, 1), :],
                 mlo_ref[pl.ds(j, 1), :])                       # (1, n)
        sel = jnp.where(iota == j, jnp.float32(1.0), zero)      # (1, n)
        B = DD(carry_hi, carry_lo)
        piv = DD(jnp.sum(col.hi * sel, keepdims=True),
                 jnp.sum(col.lo * sel, keepdims=True))          # (1, 1)
        bj = DD(jnp.sum(B.hi * sel, axis=1, keepdims=True),
                jnp.sum(B.lo * sel, axis=1, keepdims=True))     # (k, 1)
        xj = ddm.div(bj, piv)                                   # (k, 1)
        is_j = iota == j
        B = ddm.where(is_j,
                      DD(xj.hi + jnp.zeros_like(B.hi),
                         xj.lo + jnp.zeros_like(B.lo)), B)
        mask = (iota > j) if below else (iota < j)
        coef = DD(jnp.where(mask, col.hi, zero),
                  jnp.where(mask, col.lo, zero))                # (1, n)
        B = ddm.sub(B, ddm.mul(xj, coef))
        return B.hi, B.lo

    def fwd(j, carry):
        return substitute(lthi_ref, ltlo_ref, carry[0], carry[1], j,
                          below=True)

    def bwd(t, carry):
        return substitute(lhi_ref, llo_ref, carry[0], carry[1],
                          _i32(n - 1) - t, below=False)

    hi, lo = lax.fori_loop(_i32(0), _i32(n), fwd, (bhi_ref[...], blo_ref[...]))
    hi, lo = lax.fori_loop(_i32(0), _i32(n), bwd, (hi, lo))
    xhi_ref[...] = hi
    xlo_ref[...] = lo


def tri_pair_solve(L: DD, LT: DD, b: DD) -> DD:
    """VMEM-resident (L L')^-1 b; b is (n, k) dd.  vmap for batches.
    (The rhs is transposed to (k, n) around the kernel so the solve
    dimension rides the lane axis; XLA fuses the transposes.)"""
    n, k = b.hi.shape
    with _dd_trace_ctx():
        hi, lo = pl.pallas_call(
            _tri_pair_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((k, n), jnp.float32),
                jax.ShapeDtypeStruct((k, n), jnp.float32),
            ),
            interpret=_interpret(),
        )(L.hi, L.lo, LT.hi, LT.lo, b.hi.T, b.lo.T)
    return DD(hi.T, lo.T)


# ---------------------------------------------------------------------------
# INSTANCE-TILED batched dd kernels (the throughput path)
#
# A vmapped pallas_call serializes instances over the grid — each grid step
# factors ONE n~100 matrix, so the n-step hardware loop's per-step overhead
# and narrow (n, n) VPU ops repeat B times.  These kernels instead take a
# TILE of T instances per grid step as a (T, n, n) VMEM block: every
# per-step op is T-fold wider (full VPU occupancy) and the sequential step
# count drops from B*n to (B/T)*n.  Wired into the vmapped lockstep driver
# via jax.custom_batching.custom_vmap on cholesky_dd_v / tri_pair_solve_v:
# under vmap the rule sees the whole stacked batch and dispatches here.
# ---------------------------------------------------------------------------


def _dd_chol_batch_kernel(hi_ref, lo_ref, lhi_ref, llo_ref):
    """Right-looking dd Cholesky on a (T, n, n) tile.  Row j of each
    working matrix is read via one dynamic ref slice; the update column
    c = M[:, :, j] is recovered with a masked VPU reduction over the lane
    axis (a (T, 1, n) -> (T, n, 1) transpose does not lower in Mosaic;
    the extra O(T n^2) masked pass costs ~20% of the rank-1 update)."""
    T, n, _ = hi_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (T, n, n), 1)
    cols = lax.broadcasted_iota(jnp.int32, (T, n, n), 2)
    iota_r = lax.broadcasted_iota(jnp.int32, (T, 1, n), 2)
    lane = lax.broadcasted_iota(jnp.int32, (T, n, n), 2)
    zero = jnp.float32(0.0)

    lhi_ref[...] = hi_ref[...]
    llo_ref[...] = lo_ref[...]

    def step(j, _):
        row = DD(lhi_ref[:, pl.ds(j, 1), :],
                 llo_ref[:, pl.ds(j, 1), :])                    # (T, 1, n)
        sel = jnp.where(iota_r == j, jnp.float32(1.0), zero)
        piv = DD(jnp.sum(row.hi * sel, axis=2, keepdims=True),
                 jnp.sum(row.lo * sel, axis=2, keepdims=True))  # (T, 1, 1)
        d = ddm.sqrt(piv)
        cmask = iota_r >= j
        crow = ddm.div(
            DD(jnp.where(cmask, row.hi, zero),
               jnp.where(cmask, row.lo, zero)), d)              # (T, 1, n)
        M = DD(lhi_ref[...], llo_ref[...])
        # column vector via masked lane reduction (no transpose in Mosaic)
        csel = jnp.where(lane == j, jnp.float32(1.0), zero)
        c_hi = jnp.sum(M.hi * csel, axis=2, keepdims=True)      # (T, n, 1)
        c_lo = jnp.sum(M.lo * csel, axis=2, keepdims=True)
        rmask = lax.broadcasted_iota(jnp.int32, (T, n, 1), 1) >= j
        c = ddm.div(DD(jnp.where(rmask, c_hi, zero),
                       jnp.where(rmask, c_lo, zero)), d)        # (T, n, 1)
        upd = ddm.sub(M, ddm.mul(c, crow))
        trail = (rows > j) & (cols > j)
        M = ddm.where(trail, upd, M)
        M = ddm.where(cols == j,
                      DD(c.hi + jnp.zeros_like(M.hi),
                         c.lo + jnp.zeros_like(M.lo)), M)
        lhi_ref[...] = M.hi
        llo_ref[...] = M.lo
        return _i32(0)

    # carry must be i32: a weak Python 0 promotes to i64 under x64, and
    # Mosaic cannot legalize an i64 func.return (verified on hardware)
    lax.fori_loop(_i32(0), _i32(n), step, _i32(0))
    lower = rows >= cols
    lhi_ref[...] = jnp.where(lower, lhi_ref[...], zero)
    llo_ref[...] = jnp.where(lower, llo_ref[...], zero)


def _pick_tile(B: int, n: int, budget_mb: float = 4.0) -> int:
    """Largest power-of-two tile with in+out dd blocks within the VMEM
    budget; clamped to the batch."""
    per_inst = 4 * n * n * 4                     # hi+lo, in+out, f32
    t = max(1, int(budget_mb * (1 << 20)) // max(per_inst, 1))
    t = 1 << (t.bit_length() - 1)
    while B % t:
        t //= 2
    return max(t, 1)


def cholesky_dd_batched(H: DD, tile: int | None = None) -> DD:
    """Lower dd Cholesky of a (B, n, n) dd batch, T instances per grid
    step (see header)."""
    B, n, _ = H.hi.shape
    T = tile or _pick_tile(B, n)
    if B % T:
        raise ValueError(f"batch {B} not divisible by tile {T}")
    # index-map zeros must be i32: weak Python 0 promotes to i64 under
    # x64, and Mosaic cannot legalize the index map's i64 func.return
    # (same failure class as the fori_loop carries above)
    spec = pl.BlockSpec((T, n, n), lambda i: (i, _i32(0), _i32(0)))
    with _dd_trace_ctx():
        hi, lo = pl.pallas_call(
            _dd_chol_batch_kernel,
            grid=(B // T,),
            in_specs=(spec, spec),
            out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, n, n), jnp.float32),
                jax.ShapeDtypeStruct((B, n, n), jnp.float32),
            ),
            interpret=_interpret(),
        )(H.hi, H.lo)
    return DD(hi, lo)


def _tri_pair_batch_kernel(lhi_ref, llo_ref, lthi_ref, ltlo_ref,
                           bhi_ref, blo_ref, xhi_ref, xlo_ref):
    """(L L')^-1 B on a (T, n, n) factor tile with (T, k, n) TRANSPOSED
    rhs (solve dimension on the lane axis; see _tri_pair_kernel)."""
    T, n, _ = lhi_ref.shape
    iota = lax.broadcasted_iota(jnp.int32, (T, 1, n), 2)
    zero = jnp.float32(0.0)

    def substitute(mhi_ref, mlo_ref, carry_hi, carry_lo, j, below):
        col = DD(mhi_ref[:, pl.ds(j, 1), :],
                 mlo_ref[:, pl.ds(j, 1), :])                    # (T, 1, n)
        sel = jnp.where(iota == j, jnp.float32(1.0), zero)
        B = DD(carry_hi, carry_lo)                              # (T, k, n)
        piv = DD(jnp.sum(col.hi * sel, axis=2, keepdims=True),
                 jnp.sum(col.lo * sel, axis=2, keepdims=True))  # (T, 1, 1)
        bj = DD(jnp.sum(B.hi * sel, axis=2, keepdims=True),
                jnp.sum(B.lo * sel, axis=2, keepdims=True))     # (T, k, 1)
        xj = ddm.div(bj, piv)
        is_j = iota == j
        B = ddm.where(is_j,
                      DD(xj.hi + jnp.zeros_like(B.hi),
                         xj.lo + jnp.zeros_like(B.lo)), B)
        mask = (iota > j) if below else (iota < j)
        coef = DD(jnp.where(mask, col.hi, zero),
                  jnp.where(mask, col.lo, zero))
        B = ddm.sub(B, ddm.mul(xj, coef))
        return B.hi, B.lo

    def fwd(j, carry):
        return substitute(lthi_ref, ltlo_ref, carry[0], carry[1], j,
                          below=True)

    def bwd(t, carry):
        return substitute(lhi_ref, llo_ref, carry[0], carry[1],
                          _i32(n - 1) - t, below=False)

    hi, lo = lax.fori_loop(_i32(0), _i32(n), fwd,
                           (bhi_ref[...], blo_ref[...]))
    hi, lo = lax.fori_loop(_i32(0), _i32(n), bwd, (hi, lo))
    xhi_ref[...] = hi
    xlo_ref[...] = lo


def tri_pair_solve_batched(L: DD, LT: DD, b: DD,
                           tile: int | None = None) -> DD:
    """VMEM-resident (L L')^-1 b for a (B, n, n) dd factor batch and
    (B, n, k) dd rhs, T instances per grid step."""
    B, n, k = b.hi.shape
    T = tile or _pick_tile(B, n)
    if B % T:
        raise ValueError(f"batch {B} not divisible by tile {T}")
    # i32 index-map zeros: see cholesky_dd_batched
    mspec = pl.BlockSpec((T, n, n), lambda i: (i, _i32(0), _i32(0)))
    bspec = pl.BlockSpec((T, k, n), lambda i: (i, _i32(0), _i32(0)))
    bt_hi = jnp.swapaxes(b.hi, 1, 2)
    bt_lo = jnp.swapaxes(b.lo, 1, 2)
    with _dd_trace_ctx():
        hi, lo = pl.pallas_call(
            _tri_pair_batch_kernel,
            grid=(B // T,),
            in_specs=(mspec, mspec, mspec, mspec, bspec, bspec),
            out_specs=(bspec, bspec),
            out_shape=(
                jax.ShapeDtypeStruct((B, k, n), jnp.float32),
                jax.ShapeDtypeStruct((B, k, n), jnp.float32),
            ),
            interpret=_interpret(),
        )(L.hi, L.lo, LT.hi, LT.lo, bt_hi, bt_lo)
    return DD(jnp.swapaxes(hi, 1, 2), jnp.swapaxes(lo, 1, 2))


# ---------------------------------------------------------------------------
# custom_vmap entry points: single-instance call -> single kernel;
# under jax.vmap (the lockstep batched driver) -> ONE instance-tiled call.
# ---------------------------------------------------------------------------

from jax.custom_batching import custom_vmap


def _bcast(axis_size, batched, v: DD) -> DD:
    """Broadcast an unbatched operand to the leading batch axis."""
    def one(flag, arr):
        if flag:
            return arr
        return jnp.broadcast_to(arr[None], (axis_size,) + arr.shape)
    return DD(one(batched.hi, v.hi), one(batched.lo, v.lo))


@custom_vmap
def cholesky_dd_v(H: DD) -> DD:
    return cholesky_dd(H)


@cholesky_dd_v.def_vmap
def _chol_vmap(axis_size, in_batched, H: DD):
    out = cholesky_dd_batched(_bcast(axis_size, in_batched[0], H))
    return out, DD(True, True)


@custom_vmap
def tri_pair_solve_v(L: DD, LT: DD, b: DD) -> DD:
    return tri_pair_solve(L, LT, b)


@tri_pair_solve_v.def_vmap
def _tri_vmap(axis_size, in_batched, L: DD, LT: DD, b: DD):
    out = tri_pair_solve_batched(
        _bcast(axis_size, in_batched[0], L),
        _bcast(axis_size, in_batched[1], LT),
        _bcast(axis_size, in_batched[2], b),
    )
    return out, DD(True, True)
