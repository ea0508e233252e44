"""dd32 dense linear algebra: Cholesky + triangular solves.

Right-looking, mask-based formulations: each of the n steps applies a
rank-1 dd update to the full trailing matrix under an (i > j, k > j) mask —
3x the flops of a shrinking-window Cholesky but fully vectorized over any
leading batch dims and TPU-friendly (no ragged shapes, no gathers).  All
O(n^3) work is elementwise dd32 on the VPU; for n ~ 100-500 this is cheap
next to the Ozaki GEMMs that build H.

The expensive O(m n^2) Gram products use ops/ozaki.py on the MXU; this
module only covers the O(n^3)/O(n^2 q) tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD


def _take_col(M: DD, j) -> DD:
    """Column j of (n, n) dd as (n, 1)."""
    return DD(
        lax.dynamic_slice_in_dim(M.hi, j, 1, axis=1),
        lax.dynamic_slice_in_dim(M.lo, j, 1, axis=1),
    )


def _take_row(M: DD, j) -> DD:
    return DD(
        lax.dynamic_slice_in_dim(M.hi, j, 1, axis=0),
        lax.dynamic_slice_in_dim(M.lo, j, 1, axis=0),
    )


def dd_cholesky(H: DD, unroll: int = 4) -> DD:
    """Lower Cholesky factor of a symmetric PD dd (n, n) matrix.

    Masked right-looking algorithm; batch via vmap.  `unroll` columns per
    loop step (launch-latency mitigation, see dd_solve_triangular); the
    overhang columns self-mask exactly as there.
    """
    n = H.hi.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def one_col(j, M: DD) -> DD:
        col = _take_col(M, j)                         # (n, 1)
        djj = _take_row(col, j)                       # (1, 1)
        d = ddm.sqrt(djj)
        c = ddm.div(col, d)                           # L[:, j] candidates
        # zero above the diagonal of this column
        rmask = (rows[:, :1] >= j)
        c = DD(jnp.where(rmask, c.hi, 0.0), jnp.where(rmask, c.lo, 0.0))
        # trailing update M[i>j, k>j] -= c_i * c_k
        outer = ddm.mul(c, c.T)                       # (n, n) via broadcast
        upd = ddm.sub(M, outer)
        trail = (rows > j) & (cols > j)
        M = ddm.where(trail, upd, M)
        # write column j
        is_col = cols == j
        M = ddm.where(is_col, DD(c.hi + jnp.zeros_like(M.hi),
                                 c.lo + jnp.zeros_like(M.lo)), M)
        return M

    def body(i, M: DD) -> DD:
        for t in range(unroll):
            M = one_col(i * unroll + t, M)
        return M

    M = lax.fori_loop(0, -(-n // unroll), body, H)
    lower = rows >= cols
    return DD(jnp.where(lower, M.hi, 0.0), jnp.where(lower, M.lo, 0.0))


def dd_solve_triangular(L: DD, B: DD, lower: bool = True,
                        unroll: int = 4, LT: DD | None = None) -> DD:
    """Solve L X = B (lower) or L' X = B (upper, using the same stored L).

    L: (n, n) dd lower-triangular; B: (n, q) dd.  Column-oriented
    substitution: masked rank-1 axpy per column, vectorized over q (and any
    vmap batch).  `unroll` columns run inside each loop iteration: the
    substitution is latency-bound on TPU (~13us of kernel-launch overhead
    per device-side loop step, measured at B=1 n=502), so fewer, fatter
    steps cut the wall time by ~unroll at identical arithmetic.  Overhang
    columns are self-masking: a clamped out-of-range pivot read stays
    finite and both the row write and the elimination coefficients mask to
    zero for j outside [0, n).

    `LT` (the materialized transpose of L) makes the LOWER pass read its
    per-column coefficients as rows of LT — row slices are contiguous in
    the TPU's (8, 128) tiling while column slices gather a full lane tile
    per element (~16x the traffic; this pass is memory-layout-bound).  The
    upper pass already reads rows of L.
    """
    n, q = B.hi.shape
    rows_b = lax.broadcasted_iota(jnp.int32, (n, q), 0)
    rows_m = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def one_col(j, B: DD) -> DD:
        piv = _take_row(_take_col(L, j), j)           # L[j, j] (1,1)
        bj = _take_row(B, j)                          # (1, q)
        xj = ddm.div(bj, piv)
        # write solved row j
        is_row = rows_b == j
        B = ddm.where(is_row, DD(xj.hi + jnp.zeros_like(B.hi),
                                 xj.lo + jnp.zeros_like(B.lo)), B)
        # eliminate from the remaining rows
        if lower:
            # column j of L; via a contiguous row of LT when available
            coef = _take_row(LT, j).T if LT is not None else _take_col(L, j)
            mask = rows_m > j
        else:
            coef = _take_row(L, j).T                  # row j: L[j, i] = L'[i, j]
            mask = rows_m < j
        coef = DD(jnp.where(mask, coef.hi, 0.0), jnp.where(mask, coef.lo, 0.0))
        return ddm.sub(B, ddm.mul(coef, xj))          # (n,1)*(1,q) broadcast

    def body(i, B: DD) -> DD:
        for t in range(unroll):
            jj = i * unroll + t
            j = jj if lower else n - 1 - jj
            B = one_col(j, B)
        return B

    return lax.fori_loop(0, -(-n // unroll), body, B)


def dd_chol_solve(L: DD, B: DD, LT: DD | None = None) -> DD:
    """(L L')^-1 B via forward + backward substitution.

    Pass LT = L.T (materialized once per factorization) to give the
    forward pass contiguous row reads — see dd_solve_triangular."""
    y = dd_solve_triangular(L, B, lower=True, LT=LT)
    return dd_solve_triangular(L, y, lower=False)


def _tri_inv_from_base(L: DD, inv_diag: DD, base: int) -> DD:
    """Lower-triangular inverse given the PRE-INVERTED diagonal blocks.

    L: (npad, npad) dd lower-tri, npad = base * 2^k (identity tail beyond
    the caller's real n); inv_diag: (npad/base, base, base) dd inverses of
    L's diagonal blocks.  Fills the off-diagonal inverse blocks with
    log2(npad/base) levels of batched Ozaki GEMMs (see dd_tri_inv)."""
    from socp_tpu.ops.ozaki import dd_matmul

    npad = L.hi.shape[-1]
    nblk = npad // base

    Xhi = jnp.zeros((npad, npad), jnp.float32)
    Xlo = jnp.zeros((npad, npad), jnp.float32)
    for i in range(nblk):
        sl = slice(i * base, (i + 1) * base)
        Xhi = Xhi.at[sl, sl].set(inv_diag.hi[i])
        Xlo = Xlo.at[sl, sl].set(inv_diag.lo[i])
    X = DD(Xhi, Xlo)

    s = base
    while s < npad:
        offs = list(range(0, npad, 2 * s))
        Ainv = DD(jnp.stack([X.hi[o:o + s, o:o + s] for o in offs]),
                  jnp.stack([X.lo[o:o + s, o:o + s] for o in offs]))
        Cinv = DD(jnp.stack([X.hi[o + s:o + 2 * s, o + s:o + 2 * s]
                             for o in offs]),
                  jnp.stack([X.lo[o + s:o + 2 * s, o + s:o + 2 * s]
                             for o in offs]))
        B = DD(jnp.stack([L.hi[o + s:o + 2 * s, o:o + s] for o in offs]),
               jnp.stack([L.lo[o + s:o + 2 * s, o:o + s] for o in offs]))
        off = jax.vmap(dd_matmul)(jax.vmap(dd_matmul)(Cinv, B), Ainv).neg()
        for j, o in enumerate(offs):
            X = DD(X.hi.at[o + s:o + 2 * s, o:o + s].set(off.hi[j]),
                   X.lo.at[o + s:o + 2 * s, o:o + s].set(off.lo[j]))
        s *= 2
    return X


def dd_tri_inv(L: DD, base: int = 32) -> DD:
    """Explicit inverse of a lower-triangular dd (n, n) matrix.

    Recursive block bisection: [[A, 0], [B, C]]^-1 = [[A^-1, 0],
    [-C^-1 B A^-1, C^-1]].  All `base`-sized diagonal blocks invert in ONE
    vmapped substitution (base/unroll sequential steps for the whole
    matrix), then log2(n/base) levels of batched Ozaki GEMMs fill the
    off-diagonal blocks — O(log n) kernel launches total, vs O(n) for a
    substitution per solve.  The payoff is in dd_dense.DDEqCholInv: every
    subsequent back-solve is two MXU matvecs instead of a latency-bound
    2n/unroll-step substitution chain (measured ~28us/step on TPU v5e).

    Numerics: applying an explicit triangular inverse is not backward
    stable, but the forward error stays O(eps_dd * kappa(L)) — the same
    order as substitution — and every KKT solve is wrapped in iterative
    refinement, which contracts on the measured residual either way.
    """
    from socp_tpu.ops.ozaki import dd_matmul

    n = L.hi.shape[-1]
    if n == 0:
        return L

    def _sub_inv(Lb: DD) -> DD:
        nn = Lb.hi.shape[-1]
        eye = ddm.from_f32(jnp.eye(nn, dtype=jnp.float32))
        return dd_solve_triangular(Lb, eye, lower=True)

    if n <= base:
        return _sub_inv(L)

    # pad to base * 2^k with an identity tail: inv([[L,0],[0,I]]) keeps the
    # leading block equal to inv(L) and the cross blocks zero.
    nb = -(-n // base)
    k = (nb - 1).bit_length()
    npad = base << k
    if npad != n:
        hi = jnp.zeros((npad, npad), jnp.float32).at[:n, :n].set(L.hi)
        lo = jnp.zeros((npad, npad), jnp.float32).at[:n, :n].set(L.lo)
        idx = jnp.arange(n, npad)
        hi = hi.at[idx, idx].set(1.0)
        L = DD(hi, lo)

    nblk = npad // base
    diag = DD(
        jnp.stack([L.hi[i * base:(i + 1) * base, i * base:(i + 1) * base]
                   for i in range(nblk)]),
        jnp.stack([L.lo[i * base:(i + 1) * base, i * base:(i + 1) * base]
                   for i in range(nblk)]),
    )
    inv_diag = jax.vmap(_sub_inv)(diag)
    X = _tri_inv_from_base(L, inv_diag, base)
    return DD(X.hi[:n, :n], X.lo[:n, :n])


def _pad_tri(L: DD, npad: int) -> DD:
    """Embed a lower-triangular (n, n) dd into (npad, npad) with an
    identity tail (inverse of the embedding = embedding of the inverse)."""
    n = L.hi.shape[-1]
    hi = jnp.zeros((npad, npad), jnp.float32).at[:n, :n].set(L.hi)
    lo = jnp.zeros((npad, npad), jnp.float32).at[:n, :n].set(L.lo)
    idx = jnp.arange(n, npad)
    return DD(hi.at[idx, idx].set(1.0), lo)


def dd_chol_tri_inv(H: DD, block: int = 64) -> DD:
    """Triangular inverse Linv of the Cholesky factor of a symmetric PD
    dd (n, n) matrix, built FUSED with the factorization.

    Each panel's diagonal block is factored (unblocked dd Cholesky) and
    IMMEDIATELY inverted by one base-size substitution, which turns the
    panel solve L21 = A21 L11^-T into an MXU GEMM and hands the
    triangular-inverse level merge its base-block inverses for free — the
    separate vmapped base-inversion pass of dd_tri_inv (and the per-panel
    substitution chains of dd_cholesky_blocked) disappear.

    The SPD inverse is applied as TWO matvecs (Linv then Linv'), NOT as a
    multiplied-out Hinv = Linv' Linv: the explicit Gram costs an extra
    O(eps ||Linv||^2) rounding that measurably degrades Newton-direction
    quality near mu ~ 1e-8 (observed: straggler instances needing ~60%
    more lockstep iterations at the B=4096 contract), while the two-stage
    apply stays at substitution-grade O(eps_dd * kappa) forward error.

    block=64 beats 32 at the contract shape (n=102: one merge level and
    half the panel/stack copies for ~4x the masked unblocked work, which
    the fused VPU sweeps absorb — measured 2206 vs 2048 solves/s).
    """
    from socp_tpu.ops.ozaki import dd_matmul

    n = H.hi.shape[-1]
    if n == 0:
        return H

    def _inv_small(Lb: DD) -> DD:
        nn = Lb.hi.shape[-1]
        eye = ddm.from_f32(jnp.eye(nn, dtype=jnp.float32))
        return dd_solve_triangular(Lb, eye, lower=True)

    def _vpad(x: DD, top: int) -> DD:
        if not top:
            return x
        z = jnp.zeros((top, x.hi.shape[1]), x.hi.dtype)
        return DD(jnp.concatenate([z, x.hi]), jnp.concatenate([z, x.lo]))

    panels, invs = [], []
    S = H
    j0 = 0
    while n - j0 > block:
        b = block
        L11 = dd_cholesky(S[:b, :b])
        L11inv = _inv_small(L11)
        L21 = dd_matmul(S[b:, :b], DD(L11inv.hi.T, L11inv.lo.T))
        S = ddm.sub(S[b:, b:], dd_matmul(L21, L21.T))
        panels.append(_vpad(DD(
            jnp.concatenate([L11.hi, L21.hi]),
            jnp.concatenate([L11.lo, L21.lo]),
        ), j0))
        invs.append(L11inv)
        j0 += b
    Lb = dd_cholesky(S)
    panels.append(_vpad(Lb, j0))
    invs.append(_inv_small(Lb))
    L = DD(
        jnp.concatenate([p.hi for p in panels], axis=1),
        jnp.concatenate([p.lo for p in panels], axis=1),
    )

    if n <= block:
        Linv = invs[0]
    else:
        # pad to base * 2^k and hand the level merge its base inverses
        nb = -(-n // block)
        k = (nb - 1).bit_length()
        npad = block << k
        Lp = _pad_tri(L, npad)
        stack = []
        for inv in invs:
            bs = inv.hi.shape[-1]
            stack.append(_pad_tri(inv, block) if bs < block else inv)
        for _ in range(npad // block - len(stack)):
            eye = ddm.from_f32(jnp.eye(block, dtype=jnp.float32))
            stack.append(eye)
        inv_diag = DD(jnp.stack([s_.hi for s_ in stack]),
                      jnp.stack([s_.lo for s_ in stack]))
        X = _tri_inv_from_base(Lp, inv_diag, block)
        Linv = DD(X.hi[:n, :n], X.lo[:n, :n])
    return Linv


def dd_cholesky_blocked(H: DD, block: int = 32) -> DD:
    """Lower dd Cholesky, blocked right-looking (static Python block loop).

    The unblocked kernel makes n full passes over the (n, n) working set —
    n HBM round-trips under XLA.  Blocking by `block` columns confines the
    sequential rank-1 work to the (block, block) diagonal tile and the
    (block, r) panel; the O(n^3) trailing update becomes one Ozaki MXU GEMM
    per panel, cutting full-matrix passes from n to n/block.  Identical
    arithmetic precision (all dd32); batch via vmap as usual.
    """
    from socp_tpu.ops.ozaki import dd_matmul

    n = H.hi.shape[-1]
    if n <= block:
        return dd_cholesky(H)

    def _vpad(x: DD, top: int) -> DD:
        if not top:
            return x
        z = jnp.zeros((top, x.hi.shape[1]), x.hi.dtype)
        return DD(jnp.concatenate([z, x.hi]), jnp.concatenate([z, x.lo]))

    panels = []
    S = H
    j0 = 0
    while n - j0 > block:
        b = block
        L11 = dd_cholesky(S[:b, :b])
        # L21 = A21 L11^{-T}  <=>  L11 L21' = A21'
        L21 = dd_solve_triangular(L11, S[b:, :b].T, lower=True).T
        S = ddm.sub(S[b:, b:], dd_matmul(L21, L21.T))
        panels.append(_vpad(DD(
            jnp.concatenate([L11.hi, L21.hi]),
            jnp.concatenate([L11.lo, L21.lo]),
        ), j0))
        j0 += b
    panels.append(_vpad(dd_cholesky(S), j0))
    return DD(
        jnp.concatenate([p.hi for p in panels], axis=1),
        jnp.concatenate([p.lo for p in panels], axis=1),
    )

