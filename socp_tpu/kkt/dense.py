"""Dense condensed KKT subsystem (KKTStrategy.DENSE).

The quasidefinite 3x3 system

    [P   A'  G' ] [dx]   [bx]
    [A   0   0  ] [dy] = [by]
    [G   0  -W'W] [dz]   [bz]

is reduced to two SPD factorizations per IPM iteration (SURVEY.md 3.2 TPU
note (a)):

    Ghat = W^-1 G                      (blockwise diag + rank-1, O(mn))
    H    = Paug + Ghat'Ghat + delta I  -> Cholesky L_H      (n x n)
    S    = A H^-1 A'    + delta I      -> Cholesky L_S      (p x p)

    dy = S^-1 (A H^-1 btx - by),  btx = bx + Ghat' (W^-1 bz)
    dx = H^-1 (btx - A'dy)
    dz = W^-1 (Ghat dx - W^-1 bz)

`Paug = P + rho A'A` is the augmented-Lagrangian condensation: plain
P + G'W^-2 G is only PD when rank([P;G]) = n, but well-posedness merely
guarantees rank([P;A;G]) = n.  Adding rho A'A (constant across iterations —
computed once outside the IPM loop) makes H PD under exactly that
assumption, and the substitution y_hat = dy - rho*by makes the augmented
2x2 system EXACTLY equivalent to the original (no perturbation):
solve with H_aug, then correct dy = y_hat + rho*by.

All heavy work is dense GEMM / Cholesky / triangular-solve on the MXU; the
whole module is vmap-able for the batched path.  Optional iterative
refinement re-solves with the residual of the *full* 3x3 system, which both
repairs rounding error and lets an f32 factorization reach 1e-8 gaps
(SURVEY.md 7.3.1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from socp_tpu.cones import ops as cops
from socp_tpu.cones.layout import ConeLayout


class EqChol(NamedTuple):
    """Jacobi-equilibrated Cholesky factor of an SPD matrix M:
    L L' = D M D + delta I with D = diag(1/sqrt(diag M)).

    Equilibration bounds the diagonal spread (IPM H matrices mix 1/mu and mu
    scalings across rows), and the static delta on the *unit-diagonal* system
    is a scale-free regularization: the perturbation is delta relative to
    each row's own magnitude — at or below the level of the roundoff already
    committed when forming M = Ghat'Ghat on the MXU.  Accuracy is restored
    by iterative refinement against the true 3x3 KKT system.
    """

    L: jax.Array
    d: jax.Array

    def solve(self, rhs: jax.Array) -> jax.Array:
        r = self.d[:, None] * rhs if rhs.ndim == 2 else self.d * rhs
        y = jax.scipy.linalg.solve_triangular(self.L, r, lower=True)
        y = jax.scipy.linalg.solve_triangular(self.L.T, y, lower=False)
        return self.d[:, None] * y if rhs.ndim == 2 else self.d * y


def _eq_chol(M: jax.Array, delta: float) -> EqChol:
    dtype = M.dtype
    diag = jnp.diagonal(M)
    tiny = jnp.asarray(jnp.finfo(dtype).tiny ** 0.5, dtype)
    d = 1.0 / jnp.sqrt(jnp.maximum(diag, tiny))
    Mn = d[:, None] * M * d[None, :]
    # floor the regularization at a multiple of the factor dtype's epsilon:
    # the unit-diagonal system's roundoff scale (matters for f32 factors)
    delta_eff = max(delta, 32.0 * float(jnp.finfo(dtype).eps))
    Mn = Mn + delta_eff * jnp.eye(M.shape[0], dtype=dtype)
    return EqChol(L=jnp.linalg.cholesky(Mn), d=d)


def _chol_solve(f: EqChol, rhs: jax.Array) -> jax.Array:
    return f.solve(rhs)


class DenseKKT(NamedTuple):
    """Factored condensed system (pytree of arrays).

    When `factor_dtype` is lower than the carry dtype (the dsgesv-style
    mixed-precision mode), L_H/L_S/Ghat/scaling_lo live in the factor dtype
    — the whole back-solve runs on the fast MXU path — while `scaling`
    keeps the carry dtype for the refinement residual's W'W products.
    """

    L_H: EqChol           # equilibrated Cholesky of H (n x n)
    L_S: EqChol           # equilibrated Cholesky of the Schur complement
    Ghat: jax.Array       # (m_pad, n) = W^-1 G, factor dtype
    scaling: cops.Scaling      # carry dtype (refinement)
    scaling_lo: cops.Scaling   # factor dtype (back-solves)


def factor(
    layout: ConeLayout,
    scaling: cops.Scaling,
    Paug: jax.Array | None,
    A: jax.Array,
    G: jax.Array,
    delta: float = 0.0,
    factor_dtype=None,
) -> DenseKKT:
    """Assemble + factor; the per-iteration hot path (north-star metric).

    `Paug` must already include the rho*A'A augmentation (see module doc).
    """
    if factor_dtype == "dd32":
        from socp_tpu.kkt import dd_dense

        return dd_dense.factor(layout, scaling, Paug, A, G, delta)
    p = A.shape[0]
    fdt = jnp.dtype(factor_dtype) if factor_dtype else G.dtype
    Ghat = cops.scale_rows_Winv(layout, scaling, G).astype(fdt)
    H = Ghat.T @ Ghat
    if Paug is not None:
        H = H + Paug.astype(fdt)
    L_H = _eq_chol(H, delta)
    if p:
        HinvAT = L_H.solve(A.astype(fdt).T)
        S = A.astype(fdt) @ HinvAT
        L_S = _eq_chol(S, delta)
    else:
        L_S = EqChol(L=jnp.zeros((0, 0), dtype=fdt), d=jnp.zeros((0,), fdt))
    scaling_lo = (
        jax.tree_util.tree_map(lambda a: a.astype(fdt), scaling)
        if fdt != G.dtype
        else scaling
    )
    return DenseKKT(L_H=L_H, L_S=L_S, Ghat=Ghat, scaling=scaling,
                    scaling_lo=scaling_lo)


def solve(
    layout: ConeLayout,
    kkt: DenseKKT,
    A: jax.Array,
    bx: jax.Array,
    by: jax.Array,
    bz: jax.Array,
    aug_rho: float = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One condensed back-solve (2-3 of these reuse a factorization).

    The augmented 2x2 system's multiplier y_hat relates to the true dy by
    dy = y_hat + rho*by (exact; see module doc), applied here.
    """
    if getattr(kkt, "is_dd", False):
        from socp_tpu.kkt import dd_dense

        return dd_dense.solve(layout, kkt, A, bx, by, bz, aug_rho=aug_rho)
    p = A.shape[0]
    fdt = kkt.Ghat.dtype
    bx, by, bz = bx.astype(fdt), by.astype(fdt), bz.astype(fdt)
    A = A.astype(fdt)
    bhz = cops.apply_Winv(layout, kkt.scaling_lo, bz)
    btx = bx + kkt.Ghat.T @ bhz
    if p:
        t1 = _chol_solve(kkt.L_H, btx)
        yhat = _chol_solve(kkt.L_S, A @ t1 - by)
        dx = _chol_solve(kkt.L_H, btx - A.T @ yhat)
        dy = yhat + aug_rho * by if aug_rho else yhat
    else:
        dy = by  # empty
        dx = _chol_solve(kkt.L_H, btx)
    dz = cops.apply_Winv(layout, kkt.scaling_lo, kkt.Ghat @ dx - bhz)
    return dx, dy, dz


def solve_refined(
    layout: ConeLayout,
    kkt: DenseKKT,
    P: jax.Array | None,
    A: jax.Array,
    G: jax.Array,
    bx: jax.Array,
    by: jax.Array,
    bz: jax.Array,
    refine_steps: int = 0,
    refine_in_f64: bool = False,
    aug_rho: float = 0.0,
):
    """KKT solve + iterative refinement on the full 3x3 residual.

    `P` here is the ORIGINAL quadratic term (None for pure SOCP) — the
    residual is of the true system, while the cached factorization inside
    `kkt` is of the augmented one.

    Residual matvecs are O(n^2): cheap relative to the O(n^3) factorization,
    so they can run in f64 (software-emulated on TPU) while the Cholesky
    stays f32 — the precision strategy from SURVEY.md 7.1/7.3.1.
    """
    carry = bx.dtype
    dx, dy, dz = solve(layout, kkt, A, bx, by, bz, aug_rho=aug_rho)
    dx, dy, dz = dx.astype(carry), dy.astype(carry), dz.astype(carry)
    quality = jnp.zeros((), carry)
    if refine_steps <= 0:
        return dx, dy, dz, quality

    hi = jnp.float64 if refine_in_f64 else carry
    sc = kkt.scaling

    def residual(dx, dy, dz):
        dxh, dyh, dzh = dx.astype(hi), dy.astype(hi), dz.astype(hi)
        Gh = G.astype(hi)
        Ah = A.astype(hi)
        rx = bx.astype(hi) - (Ah.T @ dyh + Gh.T @ dzh)
        if P is not None:
            rx = rx - P.astype(hi) @ dxh
        ry = by.astype(hi) - Ah @ dxh
        # W'W dz = W (W dz): scaling arrays are lo-precision; the refinement
        # target is condensation error, dominated by the factorization dtype.
        WWdz = cops.apply_W(layout, sc, cops.apply_W(layout, sc, dz)).astype(hi)
        rz = bz.astype(hi) - (Gh @ dxh - WWdz)
        return rx, ry, rz

    rhs_norm = jnp.sqrt(bx @ bx + by @ by + bz @ bz).astype(carry) + 1.0
    for _ in range(refine_steps):
        rx, ry, rz = residual(dx, dy, dz)
        # relative residual BEFORE the last correction: a conservative,
        # zero-extra-cost estimate of how well the factorization solves the
        # true system (drives the driver's direction-quality stall guard)
        quality = (
            jnp.sqrt(rx @ rx + ry @ ry + rz @ rz).astype(carry) / rhs_norm
        )
        ex, ey, ez = solve(layout, kkt, A, rx, ry, rz, aug_rho=aug_rho)
        dx = dx + ex.astype(carry)
        dy = dy + ey.astype(carry)
        dz = dz + ez.astype(carry)
    return dx, dy, dz, quality
