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
from socp_tpu.ops.dd_linalg import dd_chol_solve, dd_cholesky
from socp_tpu.ops.ozaki import dd_matmul


class DDEqChol(NamedTuple):
    """Jacobi-equilibrated dd Cholesky: L L' = D M D + delta I."""

    L: DD
    d: DD            # (n,) equilibration diag

    def solve(self, rhs: DD) -> DD:
        r = ddm.mul(rhs, DD(self.d.hi[:, None], self.d.lo[:, None]))
        y = dd_chol_solve(self.L, r)
        return ddm.mul(y, DD(self.d.hi[:, None], self.d.lo[:, None]))


def _dd_eq_chol(M: DD, delta: float) -> DDEqChol:
    n = M.hi.shape[-1]
    diag = DD(jnp.diagonal(M.hi), jnp.diagonal(M.lo))
    tiny = jnp.float32(2.0 ** -80)
    safe = ddm.where(diag.hi > tiny, diag, ddm.from_f32(jnp.full_like(diag.hi, 1.0)))
    d = ddm.rsqrt(safe)
    Dr = DD(d.hi[:, None], d.lo[:, None])
    Dc = DD(d.hi[None, :], d.lo[None, :])
    Mn = ddm.mul(ddm.mul(M, Dr), Dc)
    if delta:
        eye = jnp.eye(n, dtype=jnp.float32)
        Mn = ddm.add(Mn, ddm.from_f32(jnp.float32(delta) * eye))
    return DDEqChol(L=dd_cholesky(Mn), d=d)


class DDKKT(NamedTuple):
    L_H: DDEqChol
    L_S: DDEqChol
    Ghat: DD                   # (m_pad, n) dd
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
    H = dd_matmul(Ghat.T, Ghat)
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
        L_S = DDEqChol(L=DD(z2, z2), d=DD(z1, z1))
    return DDKKT(L_H=L_H, L_S=L_S, Ghat=Ghat, scaling=scaling)


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
        dd_matmul(kkt.Ghat.T, _vec(ddm.from_f64(bhz))),
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
    Gdx = dd_matmul(kkt.Ghat, dx).astype_f64()[:, 0]
    dz = cops.apply_Winv(layout, kkt.scaling, Gdx - bhz)
    return _unvec(dx), dy, dz
