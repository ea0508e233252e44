"""Cone kernels (Jordan algebra) on the padded flat layout — pure jnp.

Every function takes the static `ConeLayout` plus padded flat vectors of
length `layout.m_pad`, views SOC buckets as free `(n_blocks, q_pad)`
reshapes, and runs batched elementwise / small-reduction ops (VPU) and
rank-1 outer products (MXU for the matrix variants).  Formulas follow
SURVEY.md Appendix A (numerically verified there); the NumPy oracle in
socp_tpu.utils.oracle is the executable spec these must match.

Zero tail-padding is exact and preserved by every op here (see layout.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from socp_tpu.cones.layout import ConeLayout


def _orth(layout: ConeLayout, u: jax.Array) -> jax.Array:
    return u[: layout.l]


def _views(layout: ConeLayout, u: jax.Array):
    """Bucket views [(n_blocks, q_pad), ...] of a padded flat vector."""
    return [
        u[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad)
        for b in layout.buckets
    ]


def _flat(pieces) -> jax.Array:
    return jnp.concatenate([p.reshape(-1) for p in pieces])


def _J(ub: jax.Array) -> jax.Array:
    """Reflection J = diag(1, -1, ..., -1) applied to rows."""
    return jnp.concatenate([ub[:, :1], -ub[:, 1:]], axis=1)


def _jdet(ub: jax.Array) -> jax.Array:
    """Jordan determinant u0^2 - ||u1||^2 per block row."""
    return 2.0 * ub[:, 0] ** 2 - jnp.sum(ub * ub, axis=1)


def identity(layout: ConeLayout, dtype=jnp.float64) -> jax.Array:
    pieces = [jnp.ones((layout.l,), dtype)]
    for b in layout.buckets:
        e = jnp.zeros((b.n_blocks, b.q_pad), dtype)
        e = e.at[:, 0].set(1.0)
        pieces.append(e)
    return _flat(pieces)


def jprod(layout: ConeLayout, u: jax.Array, v: jax.Array) -> jax.Array:
    """Jordan product u o v."""
    pieces = [_orth(layout, u) * _orth(layout, v)]
    for ub, vb in zip(_views(layout, u), _views(layout, v)):
        dot = jnp.sum(ub * vb, axis=1, keepdims=True)       # u'v per block
        rest = (ub[:, :1] * vb + vb[:, :1] * ub)[:, 1:]     # u0 v1 + v0 u1
        pieces.append(jnp.concatenate([dot, rest], axis=1))
    return _flat(pieces)


def jdiv(layout: ConeLayout, lam: jax.Array, d: jax.Array) -> jax.Array:
    """Solve lam o u = d for u (lam interior)."""
    pieces = [_orth(layout, d) / _orth(layout, lam)]
    for lb, db in zip(_views(layout, lam), _views(layout, d)):
        det = _jdet(lb)
        l0 = lb[:, 0]
        # lam1'd1 = lam'd - lam0 d0
        l1d1 = jnp.sum(lb * db, axis=1) - l0 * db[:, 0]
        u0 = (l0 * db[:, 0] - l1d1) / det
        u1 = (db[:, 1:] - u0[:, None] * lb[:, 1:]) / l0[:, None]
        pieces.append(jnp.concatenate([u0[:, None], u1], axis=1))
    return _flat(pieces)


def lambda_min(layout: ConeLayout, u: jax.Array) -> jax.Array:
    """Smallest Jordan eigenvalue: min(u_orth) and u0 - ||u1|| per SOC."""
    vals = []
    if layout.l:
        vals.append(jnp.min(_orth(layout, u)))
    for ub in _views(layout, u):
        n1 = jnp.sqrt(
            jnp.maximum(jnp.sum(ub * ub, axis=1) - ub[:, 0] ** 2, 0.0)
        )
        vals.append(jnp.min(ub[:, 0] - n1))
    return jnp.min(jnp.stack(vals)) if vals else jnp.asarray(jnp.inf, u.dtype)


def eig_clip_delta(layout: ConeLayout, v: jax.Array, lo, hi) -> jax.Array:
    """clip(v, [lo, hi]) - v in the Jordan spectral sense, per block.

    Orthant coordinates clip elementwise.  Each SOC block's spectral values
    lam_pm = v0 +- ||v1|| clip independently; the returned delta is
    (dp + dm)/2 e0 + (dp - dm)/2 * (0, v1/||v1||), which is EXACTLY zero on
    blocks already inside the band (dp = dm = 0 => both terms vanish), so a
    corrector built from it perturbs only outlier blocks.  Used by the
    Gondzio centrality correctors (the target is a heuristic — plain
    working-precision arithmetic suffices).
    """
    vo = _orth(layout, v)
    pieces = [jnp.clip(vo, lo, hi) - vo]
    for vb in _views(layout, v):
        n1 = jnp.sqrt(
            jnp.maximum(jnp.sum(vb * vb, axis=1) - vb[:, 0] ** 2, 0.0)
        )
        lp = vb[:, 0] + n1
        lm = vb[:, 0] - n1
        dp = jnp.clip(lp, lo, hi) - lp
        dm = jnp.clip(lm, lo, hi) - lm
        fac = 0.5 * (dp - dm) / jnp.where(n1 > 0, n1, 1.0)
        out = vb * fac[:, None]
        out = out.at[:, 0].set(0.5 * (dp + dm))
        pieces.append(out)
    return _flat(pieces)


def max_step(layout: ConeLayout, u: jax.Array, du: jax.Array) -> jax.Array:
    """sup{alpha >= 0 : u + alpha du in K} for interior u (inf if unbounded).

    SOC blocks: smallest positive root of the scalar quadratic
    det(u + a du) = 0 via the uniform stable formula a* = 2c / (-b + sqrt(D))
    (valid iff a < 0, or b < 0 with D >= 0); orthant: min(-u/du over du<0).
    Branch-free: ready for vmap/pmin.
    """
    inf = jnp.asarray(jnp.inf, u.dtype)
    alphas = []
    if layout.l:
        uo, duo = _orth(layout, u), _orth(layout, du)
        cand = jnp.where(duo < 0, -uo / duo, inf)
        alphas.append(jnp.min(cand))
    for ub, db in zip(_views(layout, u), _views(layout, du)):
        a = _jdet(db)
        # u'J du = u0 d0 - u1'd1 = 2 u0 d0 - u'du
        b = 2.0 * (2.0 * ub[:, 0] * db[:, 0] - jnp.sum(ub * db, axis=1))
        c = _jdet(ub)
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        denom = -b + sq
        valid = ((a < 0) | ((b < 0) & (disc >= 0))) & (denom > 0)
        cand = jnp.where(valid, 2.0 * c / jnp.where(denom > 0, denom, 1.0), inf)
        alphas.append(jnp.min(cand))
    return jnp.min(jnp.stack(alphas)) if alphas else inf


class Scaling(NamedTuple):
    """Nesterov-Todd scaling state (a pytree; layout stays static/outside).

    Orthant: W = diag(w).  Each SOC bucket: W = eta * P(v) with P(v) the
    quadratic representation 2vv' - J, det(v) = 1 (SURVEY.md Appendix A):
        W u    = eta   (2 v (v'u)       - J u)
        W^-1 u = eta^-1(2 (Jv)((Jv)'u)  - J u)
    """

    w_orth: jax.Array               # (l,)
    etas: tuple[jax.Array, ...]     # per bucket (n_blocks,)
    vs: tuple[jax.Array, ...]       # per bucket (n_blocks, q_pad)
    lam: jax.Array                  # (m_pad,)  lambda = W z = W^-1 s


def nt_scale(layout: ConeLayout, s: jax.Array, z: jax.Array) -> Scaling:
    so, zo = _orth(layout, s), _orth(layout, z)
    w_orth = jnp.sqrt(so / zo)
    lam_pieces = [jnp.sqrt(so * zo)]
    etas, vs = [], []
    for sb, zb in zip(_views(layout, s), _views(layout, z)):
        dets = _jdet(sb)
        detz = _jdet(zb)
        sbar = sb / jnp.sqrt(dets)[:, None]
        zbar = zb / jnp.sqrt(detz)[:, None]
        gamma = jnp.sqrt((1.0 + jnp.sum(sbar * zbar, axis=1)) / 2.0)
        wbar = (sbar + _J(zbar)) / (2.0 * gamma[:, None])
        v = wbar.at[:, 0].add(1.0) / jnp.sqrt(2.0 * (1.0 + wbar[:, 0]))[:, None]
        eta = (dets / detz) ** 0.25
        etas.append(eta)
        vs.append(v)
        # lambda = W z (blockwise, inline to avoid re-slicing)
        Jz = _J(zb)
        lam_b = eta[:, None] * (
            2.0 * v * jnp.sum(v * zb, axis=1)[:, None] - Jz
        )
        lam_pieces.append(lam_b)
    return Scaling(
        w_orth=w_orth, etas=tuple(etas), vs=tuple(vs), lam=_flat(lam_pieces)
    )


def identity_scaling(layout: ConeLayout, dtype=jnp.float64) -> Scaling:
    """W = I (initialization); lam is unused there."""
    etas, vs = [], []
    for b in layout.buckets:
        etas.append(jnp.ones((b.n_blocks,), dtype))
        v = jnp.zeros((b.n_blocks, b.q_pad), dtype).at[:, 0].set(1.0)
        vs.append(v)
    return Scaling(
        w_orth=jnp.ones((layout.l,), dtype),
        etas=tuple(etas),
        vs=tuple(vs),
        lam=identity(layout, dtype),
    )


def apply_W(layout: ConeLayout, sc: Scaling, u: jax.Array) -> jax.Array:
    pieces = [_orth(layout, u) * sc.w_orth]
    for ub, eta, v in zip(_views(layout, u), sc.etas, sc.vs):
        pieces.append(
            eta[:, None] * (2.0 * v * jnp.sum(v * ub, axis=1)[:, None] - _J(ub))
        )
    return _flat(pieces)


def apply_Winv(layout: ConeLayout, sc: Scaling, u: jax.Array) -> jax.Array:
    pieces = [_orth(layout, u) / sc.w_orth]
    for ub, eta, v in zip(_views(layout, u), sc.etas, sc.vs):
        jv = _J(v)
        pieces.append(
            (2.0 * jv * jnp.sum(jv * ub, axis=1)[:, None] - _J(ub))
            / eta[:, None]
        )
    return _flat(pieces)


def scale_rows_Winv(layout: ConeLayout, sc: Scaling, G: jax.Array) -> jax.Array:
    """W^-1 G for an (m_pad, n) matrix: diag scaling on orthant rows, a
    batched rank-1 (arrow) update per SOC bucket — O(m n) work, MXU-shaped
    outer products, never materializing W (SURVEY.md section 2.2)."""
    n = G.shape[1]
    pieces = [G[: layout.l] / sc.w_orth[:, None]]
    for b, eta, v in zip(layout.buckets, sc.etas, sc.vs):
        Gb = G[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad, n)
        jv = _J(v)
        t = jnp.einsum("bq,bqn->bn", jv, Gb)        # (Jv)' G_b
        JGb = jnp.concatenate([Gb[:, :1, :], -Gb[:, 1:, :]], axis=1)
        out = (2.0 * jv[:, :, None] * t[:, None, :] - JGb) / eta[:, None, None]
        pieces.append(out.reshape(b.size, n))
    return jnp.concatenate(pieces, axis=0)
