"""Condensed KKT factor/solve in dd32 (factor_dtype="dd32").

Same condensation as kkt/dense.py, but the factor pipeline runs in
double-word f32: H is formed by the Ozaki MXU GEMM, Cholesky and triangular
solves in elementwise dd32 — TPU-fast arithmetic with ~2^-48 effective
precision, enough to keep iterative refinement contracting at the
kappa ~ 1/mu^2 conditioning of 1e-8-gap IPM iterations (where a plain f32
factor stalls near 1e-6; see SURVEY.md 7.3.1).

The surrounding IPM carries stay f64 (XLA-emulated, cheap at O(m) per op);
only O(m n^2)/O(n^3) work is dd32.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from socp_tpu.cones import ops as cops
from socp_tpu.cones.layout import ConeLayout
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD
from socp_tpu.ops.dd_linalg import (dd_chol_solve, dd_chol_tri_inv,
                                    dd_cholesky_blocked)
from socp_tpu.ops.ozaki import (SlicedMat, dd_matmul, preslice,
                                sliced_gram, sliced_matmul)


class DDEqChol(NamedTuple):
    """Jacobi-equilibrated dd Cholesky: L L' = D M D + delta I.

    LT caches the materialized transpose so the forward substitution reads
    contiguous rows (TPU tiling makes column gathers ~16x the traffic)."""

    L: DD
    d: DD            # (n,) equilibration diag
    LT: DD

    def solve(self, rhs: DD) -> DD:
        r = ddm.mul(rhs, DD(self.d.hi[:, None], self.d.lo[:, None]))
        y = dd_chol_solve(self.L, r, LT=self.LT)
        return ddm.mul(y, DD(self.d.hi[:, None], self.d.lo[:, None]))


class DDEqCholPallas(NamedTuple):
    """DDEqChol whose solves run in ONE VMEM-resident Pallas kernel.

    Same pytree layout as DDEqChol; the class itself is the (static)
    dispatch bit.  The whole forward+backward substitution is a single
    kernel (2n hardware-loop steps), vs ~2n/unroll XLA dispatches at ~12us
    each — measured 4-16x faster at n=128-512, B=1 (scripts/pallas_bench.py).
    Wins at small batch only: under vmap the grid serializes instances, so
    the batched lockstep path keeps the XLA substitution."""

    L: DD
    d: DD
    LT: DD

    def solve(self, rhs: DD) -> DD:
        from socp_tpu.ops.pallas_chol import tri_pair_solve_v

        r = ddm.mul(rhs, DD(self.d.hi[:, None], self.d.lo[:, None]))
        y = tri_pair_solve_v(self.L, self.LT, r)
        return ddm.mul(y, DD(self.d.hi[:, None], self.d.lo[:, None]))


class DDEqCholInv(NamedTuple):
    """DDEqChol whose solves apply the EXPLICIT triangular inverse.

    solve() is two presliced Ozaki matvecs — a constant number of MXU
    kernels — instead of a 2n/unroll-step substitution chain (measured
    ~28us of launch latency per step on TPU v5e, ~1.5 ms per back-solve at
    n=102 B=128 vs ~0.3 ms here).  The inverse is built once per
    factorization by dd_linalg.dd_chol_tri_inv (FUSED panel Cholesky +
    base-block inversion: panel solves become MXU GEMMs and the level
    merge gets its base inverses for free).

    Numerics: forward error of inverse-apply is O(eps_dd * kappa), the
    same order as substitution (validated head-to-head at kappa=1e10);
    the residual constant is a few x worse, which the per-solve iterative
    refinement absorbs.  Applying Linv then Linv' is deliberate — the
    multiplied-out Hinv = Linv' Linv costs an extra O(eps ||Linv||^2)
    Gram rounding that measurably slowed straggler instances' convergence
    at mu ~ 1e-8 (B=4096 contract: ~60% more lockstep iterations).  The
    factor L is not kept — only its presliced inverse."""

    Linv_s: SlicedMat
    LinvT_s: SlicedMat
    d: DD            # (n,) equilibration diag

    def solve(self, rhs: DD) -> DD:
        r = ddm.mul(rhs, DD(self.d.hi[:, None], self.d.lo[:, None]))
        y = sliced_matmul(self.Linv_s, r)
        x = sliced_matmul(self.LinvT_s, y)
        return ddm.mul(x, DD(self.d.hi[:, None], self.d.lo[:, None]))


def _pow2_eqdiag(diag_hi: jax.Array) -> jax.Array:
    """Power-of-two ~rsqrt of the diagonal: both dd words scale EXACTLY
    (plain f32 multiplies, no dd muls) and the equilibrated diagonal lands
    within 2x of 1 — a heuristic scaling, so the 2x slack is free."""
    tiny = jnp.float32(2.0 ** -80)
    safe = jnp.maximum(diag_hi, tiny)
    ev = jnp.round(-0.5 * jnp.log2(safe)).astype(jnp.int32)
    return jnp.where(diag_hi > tiny,
                     jnp.ldexp(jnp.ones_like(safe), ev),
                     jnp.ones_like(safe))


def _dd_eq_chol(M: DD, delta: float, pallas: bool = False,
                invert: bool = False) -> DDEqChol:
    n = M.hi.shape[-1]
    d32 = _pow2_eqdiag(jnp.diagonal(M.hi))
    s2 = d32[:, None] * d32[None, :]
    Mn = DD(M.hi * s2, M.lo * s2)          # exact power-of-two scaling
    if delta:
        eye = jnp.eye(n, dtype=jnp.float32)
        Mn = ddm.add(Mn, ddm.from_f32(jnp.float32(delta) * eye))
    d = ddm.from_f32(d32)
    if pallas and n > 0:
        from socp_tpu.ops.pallas_chol import cholesky_dd_v

        L = cholesky_dd_v(Mn)
        return DDEqCholPallas(L=L, d=d, LT=L.T)
    if invert and n > 0:
        Linv = dd_chol_tri_inv(Mn)
        return DDEqCholInv(Linv_s=preslice(Linv),
                           LinvT_s=preslice(DD(Linv.hi.T, Linv.lo.T)), d=d)
    L = dd_cholesky_blocked(Mn)
    return DDEqChol(L=L, d=d, LT=L.T)


class DDKKT(NamedTuple):
    L_H: DDEqChol
    L_S: DDEqChol
    Ghat_s: "SlicedMat"        # (m_pad, n) presliced:  v -> Ghat v
    GhatT_s: "SlicedMat"       # (n, m_pad) presliced:  v -> Ghat' v
    scaling: cops.Scaling      # carry-dtype (f64) NT scaling for cone ops
    # duck-typing marker used by kkt.dense dispatch
    is_dd: bool = True


def _vec(x: DD) -> DD:
    return DD(x.hi[:, None], x.lo[:, None])


def _unvec(x: DD) -> jax.Array:
    return x.astype_f64()[:, 0]


def factor(
    layout: ConeLayout,
    scaling: cops.Scaling,
    Paug: jax.Array | None,
    A: jax.Array,
    G: jax.Array,
    delta: float = 0.0,
) -> DDKKT:
    p = A.shape[0]
    Ghat64 = cops.scale_rows_Winv(layout, scaling, G)
    Ghat = ddm.from_f64(Ghat64)
    # preslice once: every back-solve's Ghat/Ghat' matvec reuses the slices
    GhatT_s = preslice(Ghat.T)
    Ghat_s = preslice(Ghat)
    H = sliced_gram(GhatT_s)
    if Paug is not None:
        H = ddm.add(H, ddm.from_f64(Paug))
    L_H = _dd_eq_chol(H, delta)
    if p:
        A_dd = ddm.from_f64(A)
        HinvAT = L_H.solve(A_dd.T)
        S = dd_matmul(A_dd, HinvAT)
        L_S = _dd_eq_chol(S, delta)
    else:
        z2 = jnp.zeros((0, 0), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        L_S = DDEqChol(L=DD(z2, z2), d=DD(z1, z1), LT=DD(z2, z2))
    return DDKKT(L_H=L_H, L_S=L_S, Ghat_s=Ghat_s, GhatT_s=GhatT_s,
                 scaling=scaling)


def solve(
    layout: ConeLayout,
    kkt: DDKKT,
    A: jax.Array,
    bx: jax.Array,
    by: jax.Array,
    bz: jax.Array,
    aug_rho: float = 0.0,
):
    """One dd back-solve; f64 in, f64 out (carries stay f64)."""
    p = A.shape[0]
    bhz = cops.apply_Winv(layout, kkt.scaling, bz)          # f64 cone op
    btx = ddm.add(
        _vec(ddm.from_f64(bx)),
        sliced_matmul(kkt.GhatT_s, _vec(ddm.from_f64(bhz))),
    )
    if p:
        A_dd = ddm.from_f64(A)
        t1 = kkt.L_H.solve(btx)
        rhs_S = ddm.sub(dd_matmul(A_dd, t1), _vec(ddm.from_f64(by)))
        yhat = kkt.L_S.solve(rhs_S)
        dx = kkt.L_H.solve(ddm.sub(btx, dd_matmul(A_dd.T, yhat)))
        dy = _unvec(yhat) + (aug_rho * by if aug_rho else 0.0)
    else:
        dy = by
        dx = kkt.L_H.solve(btx)
    Gdx = sliced_matmul(kkt.Ghat_s, dx).astype_f64()[:, 0]
    dz = cops.apply_Winv(layout, kkt.scaling, Gdx - bhz)
    return _unvec(dx), dy, dz


# ---------------------------------------------------------------------------
# dd-NATIVE variants: used by ipm/dd_driver.py, where the IPM carries
# themselves are dd32 and no f64 appears anywhere in the hot loop.
# ---------------------------------------------------------------------------

from socp_tpu.cones import dd_ops

_dd_mm = dd_matmul


def _svec(x: DD) -> DD:
    return DD(x.hi[:, None], x.lo[:, None])


def _scol(x: DD) -> DD:
    return DD(x.hi[:, 0], x.lo[:, 0])


def sliced_matvec(A: SlicedMat, x: DD) -> DD:
    return _scol(sliced_matmul(A, _svec(x)))


class DDKKTn(NamedTuple):
    """dd-native factored condensed system, STRUCTURED assembly.

    H = G' W^-2 G is built from the CONSTANT presliced G (see
    dd_ops.winv2_rho): back-solves apply W^-2 as a fused cone op and ride
    the constant G/G' slices, so no per-iteration matrix is ever sliced."""

    L_H: DDEqChol
    L_S: DDEqChol
    G_s: SlicedMat             # constant (m, n) presliced:  v -> G v
    GT_s: SlicedMat            # constant (n, m) presliced:  v -> G' v
    scaling: "dd_ops.DDScaling"


class DDKKTo(NamedTuple):
    """dd-native factored condensed system, scaled-matrix assembly
    (fallback for very many SOC blocks, where the structured rank
    correction G'V would carry NB dense columns)."""

    L_H: DDEqChol
    L_S: DDEqChol
    Ghat_s: SlicedMat          # (m, n) presliced:      v -> Ghat v
    GhatT_s: SlicedMat         # (n, m) presliced:      v -> Ghat' v
    scaling: "dd_ops.DDScaling"


# Largest SOC-block count for the structured (rank-correction) assembly;
# beyond this the m x NB generator matrix and its Ozaki matvec outgrow the
# two preslice passes they replace.
STRUCT_MAX_BLOCKS = 32


class ConstGram(NamedTuple):
    """Per-solve CONSTANT pieces of the condensed (1,1) block.

    The SOC Nesterov-Todd scaling has exactly one magnitude DOF per block:
    W_b^-2 = eta_b^-2 (2 u_b u_b' - J) with u_b = J wbar_b, so

      G_b' W_b^-2 G_b = eta_b^-2 (K_b - 2 g0_b g0_b') + 2 eta_b^-2 u_b u_b'

    where K_b = G_b' G_b and g0_b = G' e_head(b) do NOT change across IPM
    iterations (only the scalars eta_b and the vectors u_b do).  With K_b
    and g0_b precomputed once per solve, the per-iteration H assembly is a
    weighted sum of NB constant (n, n) matrices plus one rank-2NB update —
    the O(m n^2) Ozaki Gram disappears entirely for pure-SOC problems
    (e.g. the robust-LS contract), and shrinks to the orthant rows only
    otherwise.  Gated to small NB: the stacked K costs NB n^2 dd words.
    """

    K: DD                      # (NB, n, n) constant per-block Grams
    g0: DD                     # (n, NB) head-row columns G' e_head(b)
    GoT_s: SlicedMat | None    # presliced orthant G_o' (n, l); None if l=0
    Go: DD | None              # (l, n) orthant rows of G


# Largest SOC-block count for the constant-Gram assembly (memory gate:
# the stacked K is NB * n^2 dd words per instance).
CONST_GRAM_MAX_BLOCKS = 4


def precompute_const_gram(layout: ConeLayout, G: DD) -> ConstGram | None:
    """Build the per-solve constants for the ConstGram assembly, or None
    when the layout doesn't qualify (no SOC blocks, or too many)."""
    nb_total = sum(b.n_blocks for b in layout.buckets)
    if nb_total == 0 or nb_total > CONST_GRAM_MAX_BLOCKS:
        return None
    Ks_hi, Ks_lo, g0_hi, g0_lo = [], [], [], []
    for bkt in layout.buckets:
        for i in range(bkt.n_blocks):
            r0 = bkt.offset + i * bkt.q_pad
            Gb = G[r0 : r0 + bkt.q_pad]            # (q_pad, n) dd
            Kb = sliced_gram(preslice(Gb.T))       # G_b' G_b  (n, n)
            Ks_hi.append(Kb.hi)
            Ks_lo.append(Kb.lo)
            g0_hi.append(G.hi[r0])
            g0_lo.append(G.lo[r0])
    K = DD(jnp.stack(Ks_hi), jnp.stack(Ks_lo))
    g0 = DD(jnp.stack(g0_hi, axis=1), jnp.stack(g0_lo, axis=1))
    if layout.l:
        Go = G[: layout.l]
        GoT_s = preslice(Go.T)
    else:
        Go = None
        GoT_s = None
    return ConstGram(K=K, g0=g0, GoT_s=GoT_s, Go=Go)


def factor_dd(
    layout: ConeLayout,
    scaling,
    Paug: DD | None,
    A: DD,
    G: DD,
    delta: float = 0.0,
    pallas: bool = False,
    GT_s: SlicedMat | None = None,
    G_s: SlicedMat | None = None,
    invert: bool = False,
    cg: ConstGram | None = None,
) -> DDKKTn | DDKKTo:
    """Factor the condensed system H = P_aug + G' W^-2 G (+ Schur of A).

    Assembly strategy, best-first:

    * `cg` (ConstGram, precomputed once per solve): H is a weighted sum of
      the NB constant per-block Grams + one rank-2NB update + (if l > 0) a
      Gram over the orthant rows only — zero per-iteration Ozaki passes
      over the full G for pure-SOC cones.  See ConstGram.
    * constant preslices (GT_s, G_s) with few SOC blocks: STRUCTURED —
      W^-2 = eta^-2 P(J wbar) per block gives H = G' diag(rho) G +
      (G'V) diag(2 eta^-2) (G'V)' with rho/V from winv2_rho/winv2_columns —
      one dd mul + one Ozaki peel of diag(rho) G per iteration, instead of
      forming and double-preslicing W^-1 G.
    * otherwise: the scaled-matrix pipeline (preslice W^-1 G afresh).
    """
    p = A.hi.shape[0]
    nb_total = sum(b.n_blocks for b in layout.buckets)
    structured = GT_s is not None and nb_total <= STRUCT_MAX_BLOCKS

    if cg is not None and GT_s is not None:
        n = G.hi.shape[1]
        V, w2 = dd_ops.winv2_columns(layout, scaling)     # w2 = 2 eta^-2
        # H_soc = sum_b 0.5 w2_b K_b  +  [g0 | U] diag([-w2, w2]) [g0 | U]'
        e2 = ddm.mul_f32(w2, jnp.float32(0.5))            # (NB,) eta^-2
        Kw = ddm.mul(cg.K, DD(e2.hi[:, None, None], e2.lo[:, None, None]))
        H = DD(Kw.hi[0], Kw.lo[0])
        for b in range(1, Kw.hi.shape[0]):
            H = ddm.add(H, DD(Kw.hi[b], Kw.lo[b]))
        U = sliced_matmul(GT_s, V)                        # (n, NB)
        C = DD(jnp.concatenate([cg.g0.hi, U.hi], axis=1),
               jnp.concatenate([cg.g0.lo, U.lo], axis=1))  # (n, 2NB)
        w_neg = ddm.mul_f32(w2, jnp.float32(-1.0))
        wC = DD(jnp.concatenate([w_neg.hi, w2.hi]),
                jnp.concatenate([w_neg.lo, w2.lo]))         # (2NB,)
        Cw = ddm.mul(C, DD(wC.hi[None, :], wC.lo[None, :]))
        H = ddm.add(H, _dd_mm(Cw, C.T))
        if layout.l:
            one = ddm.from_f32(jnp.ones_like(scaling.w_orth.hi))
            w2o = ddm.div(one, ddm.mul(scaling.w_orth, scaling.w_orth))
            Mo = ddm.mul(cg.Go, DD(w2o.hi[:, None], w2o.lo[:, None]))
            H = ddm.add(H, sliced_matmul(cg.GoT_s, Mo))
        if Paug is not None:
            H = ddm.add(H, Paug)
        L_H = _dd_eq_chol(H, delta, pallas=pallas, invert=invert)
    elif structured:
        n = G.hi.shape[1]
        rho = dd_ops.winv2_rho(layout, scaling)
        Mrho = ddm.mul(G, DD(rho.hi[:, None], rho.lo[:, None]))
        if nb_total:
            # one multiply for [G' diag(rho) G | G' V]: the rank-correction
            # generators ride the Gram's pass over the GT slice arrays
            # (a separate sliced_matmul(GT_s, V) would re-read all 28
            # slice pairs — ~230 MB at the B=128 contract chunk — for an
            # m x NB operand)
            V, w2 = dd_ops.winv2_columns(layout, scaling)
            MV = DD(jnp.concatenate([Mrho.hi, V.hi], axis=1),
                    jnp.concatenate([Mrho.lo, V.lo], axis=1))
            HU = sliced_matmul(GT_s, MV)
            H = DD(HU.hi[:, :n], HU.lo[:, :n])
            U = DD(HU.hi[:, n:], HU.lo[:, n:])
            Uw = ddm.mul(U, DD(w2.hi[None, :], w2.lo[None, :]))
            H = ddm.add(H, _dd_mm(Uw, U.T))
        else:
            H = sliced_matmul(GT_s, Mrho)                 # G' diag(rho) G
        if Paug is not None:
            H = ddm.add(H, Paug)
        L_H = _dd_eq_chol(H, delta, pallas=pallas, invert=invert)
    else:
        Ghat = dd_ops.scale_rows_Winv(layout, scaling, G)
        GhatT_s = preslice(Ghat.T)
        Ghat_s = preslice(Ghat)
        H = sliced_gram(GhatT_s)
        if Paug is not None:
            H = ddm.add(H, Paug)
        L_H = _dd_eq_chol(H, delta, pallas=pallas, invert=invert)

    if p:
        HinvAT = L_H.solve(A.T)
        S = _dd_mm(A, HinvAT)
        L_S = _dd_eq_chol(S, delta, pallas=pallas, invert=invert)
    else:
        z2 = jnp.zeros((0, 0), jnp.float32)
        z1 = jnp.zeros((0,), jnp.float32)
        L_S = DDEqChol(L=DD(z2, z2), d=DD(z1, z1), LT=DD(z2, z2))
    if structured or (cg is not None and GT_s is not None):
        return DDKKTn(L_H=L_H, L_S=L_S, G_s=G_s, GT_s=GT_s, scaling=scaling)
    return DDKKTo(L_H=L_H, L_S=L_S, Ghat_s=Ghat_s, GhatT_s=GhatT_s,
                  scaling=scaling)


def solve_dd(
    layout: ConeLayout,
    kkt: DDKKTn | DDKKTo,
    A: DD,
    bx: DD,
    by: DD,
    bz: DD,
    aug_rho: float = 0.0,
    want_Gdx: bool = False,
):
    """One dd-native condensed back-solve (dd in, dd out).

    `want_Gdx=True` additionally returns the G dx matvec the dz mapping
    already computes (structured path) so callers — the refinement
    residual — don't pay it twice; the scaled-matrix path returns None
    there (it only forms Ghat dx)."""
    p = A.hi.shape[0]
    if isinstance(kkt, DDKKTn):
        # structured: btx = bx + G' W^-2 bz;  dz = W^-2 (G dx - bz)
        t = dd_ops.apply_Winv2(layout, kkt.scaling, bz)
        btx = ddm.add(bx, sliced_matvec(kkt.GT_s, t))
    else:
        bhz = dd_ops.apply_Winv(layout, kkt.scaling, bz)
        btx = ddm.add(bx, sliced_matvec(kkt.GhatT_s, bhz))
    if p:
        t1 = kkt.L_H.solve(_svec(btx))
        rhs_S = ddm.sub(_dd_mm(A, t1), _svec(by))
        yhat = kkt.L_S.solve(rhs_S)
        dx = _scol(kkt.L_H.solve(ddm.sub(_svec(btx), _dd_mm(A.T, yhat))))
        dy = _scol(yhat)
        if aug_rho:
            dy = ddm.add(dy, ddm.mul_f32(by, jnp.float32(aug_rho)))
    else:
        dy = by
        dx = _scol(kkt.L_H.solve(_svec(btx)))
    Gdx = None
    if isinstance(kkt, DDKKTn):
        Gdx = sliced_matvec(kkt.G_s, dx)
        dz = dd_ops.apply_Winv2(layout, kkt.scaling, ddm.sub(Gdx, bz))
    else:
        dz = dd_ops.apply_Winv(
            layout, kkt.scaling, ddm.sub(sliced_matvec(kkt.Ghat_s, dx), bhz)
        )
    if want_Gdx:
        return dx, dy, dz, Gdx
    return dx, dy, dz


class ConstMats(NamedTuple):
    """Pre-sliced constant problem data (sliced once per solve)."""

    A_s: SlicedMat | None      # (p, n)
    AT_s: SlicedMat | None     # (n, p)
    G_s: SlicedMat             # (m, n)
    GT_s: SlicedMat            # (n, m)
    P_s: SlicedMat | None      # (n, n)


def solve_refined_dd(
    layout: ConeLayout,
    kkt: DDKKTn,
    cm: ConstMats,
    A: DD,
    bx: DD,
    by: DD,
    bz: DD,
    refine_steps: int = 0,
    aug_rho: float = 0.0,
):
    """dd-native solve + refinement on the full 3x3 residual.

    Residual matvecs reuse the pre-sliced constant G/A/P — each is a
    handful of bf16 MXU passes, no f64 anywhere.
    """
    p = A.hi.shape[0]
    dx, dy, dz, Gdx = solve_dd(layout, kkt, A, bx, by, bz, aug_rho=aug_rho,
                               want_Gdx=True)
    quality = jnp.zeros((), jnp.float32)
    if refine_steps <= 0:
        return dx, dy, dz, quality

    def nrm2(v: DD):
        return jnp.sum(v.hi * v.hi)

    rhs_norm = jnp.sqrt(nrm2(bx) + nrm2(by) + nrm2(bz)) + 1.0
    for _ in range(refine_steps):
        rx = ddm.sub(bx, sliced_matvec(cm.GT_s, dz))
        if p:
            rx = ddm.sub(rx, sliced_matvec(cm.AT_s, dy))
        if cm.P_s is not None:
            rx = ddm.sub(rx, sliced_matvec(cm.P_s, dx))
        ry = by if not p else ddm.sub(by, sliced_matvec(cm.A_s, dx))
        WWdz = dd_ops.apply_W2(layout, kkt.scaling, dz)
        if Gdx is None:
            Gdx = sliced_matvec(cm.G_s, dx)
        rz = ddm.sub(bz, ddm.sub(Gdx, WWdz))
        quality = jnp.sqrt(nrm2(rx) + nrm2(ry) + nrm2(rz)) / rhs_norm
        ex, ey, ez, Gex = solve_dd(layout, kkt, A, rx, ry, rz,
                                   aug_rho=aug_rho, want_Gdx=True)
        dx = ddm.add(dx, ex)
        dy = ddm.add(dy, ey)
        dz = ddm.add(dz, ez)
        Gdx = ddm.add(Gdx, Gex) if Gex is not None else None
    return dx, dy, dz, quality
