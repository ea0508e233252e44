"""Cone kernels (Jordan algebra) in dd32 — the TPU-native hot-loop variants.

Mirrors cones/ops.py op-for-op, with all vectors as DD (double-word f32)
pairs.  Rationale: XLA's f64 emulation on TPU is ~50-100x slower than f32
even for elementwise work (measured: nt_scale at B=256 cost 15.7 ms in f64
vs microseconds of f32 flops), so the IPM carries and every cone kernel run
in dd32.  Reductions that suffer catastrophic cancellation (Jordan
determinants near the boundary, residual dots) use pairwise dd summation;
scalar *comparisons* (step lengths, termination) read the hi word.

Differential-tested against cones/ops.py (f64) in tests/test_dd_cones.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from socp_tpu.cones.layout import ConeLayout
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD


def dd_sum(x: DD, axis: int = -1) -> DD:
    """Accurate reduction along `axis`: pairwise dd adds (log2 n levels).

    Each level folds the upper CONTIGUOUS half onto the lower half —
    contiguous lane slices, unlike a stride-2 interleave which forces a
    relayout gather per level on TPU (measured ~2x the cost)."""
    hi = jnp.moveaxis(x.hi, axis, -1)
    lo = jnp.moveaxis(x.lo, axis, -1)
    n = hi.shape[-1]
    # pad to a power of two with exact zeros
    p = 1 << max(0, (n - 1).bit_length())
    if p != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, p - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    v = DD(hi, lo)
    while v.hi.shape[-1] > 1:
        h = v.hi.shape[-1] // 2
        v = ddm.add(
            DD(v.hi[..., :h], v.lo[..., :h]),
            DD(v.hi[..., h:], v.lo[..., h:]),
        )
    return DD(v.hi[..., 0], v.lo[..., 0])


def dd_dot(x: DD, y: DD, axis: int = -1) -> DD:
    return dd_sum(ddm.mul(x, y), axis=axis)


def _orth(layout: ConeLayout, u: DD) -> DD:
    return u[: layout.l]


def _views(layout: ConeLayout, u: DD):
    return [
        DD(
            u.hi[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad),
            u.lo[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad),
        )
        for b in layout.buckets
    ]


def _flat(pieces) -> DD:
    return DD(
        jnp.concatenate([p.hi.reshape(-1) for p in pieces]),
        jnp.concatenate([p.lo.reshape(-1) for p in pieces]),
    )


def _J(ub: DD) -> DD:
    return DD(
        jnp.concatenate([ub.hi[:, :1], -ub.hi[:, 1:]], axis=1),
        jnp.concatenate([ub.lo[:, :1], -ub.lo[:, 1:]], axis=1),
    )


def _jdet(ub: DD) -> DD:
    """u0^2 - ||u1||^2 per block row (dd-accurate under cancellation)."""
    u0 = ub[:, 0:1]
    sq = ddm.mul(ub, ub)
    # 2*u0^2 - sum(u^2): compute as u0^2 - sum_{i>=1} u_i^2 for less
    # cancellation: mask out column 0 of sq, dd-sum the tail
    tail = DD(sq.hi.at[:, 0].set(0.0), sq.lo.at[:, 0].set(0.0))
    nrm1 = dd_sum(tail, axis=1)
    u0sq = ddm.mul(u0, u0)
    return ddm.sub(DD(u0sq.hi[:, 0], u0sq.lo[:, 0]), nrm1)


def identity(layout: ConeLayout) -> DD:
    pieces = [ddm.from_f32(jnp.ones((layout.l,), jnp.float32))]
    for b in layout.buckets:
        e = jnp.zeros((b.n_blocks, b.q_pad), jnp.float32).at[:, 0].set(1.0)
        pieces.append(ddm.from_f32(e))
    return _flat(pieces)


def jprod(layout: ConeLayout, u: DD, v: DD) -> DD:
    pieces = [ddm.mul(_orth(layout, u), _orth(layout, v))]
    for ub, vb in zip(_views(layout, u), _views(layout, v)):
        dot = dd_dot(ub, vb, axis=1)                       # (nb,)
        rest = ddm.add(
            ddm.mul(ub[:, 0:1], vb), ddm.mul(vb[:, 0:1], ub)
        )
        out = DD(
            jnp.concatenate([dot.hi[:, None], rest.hi[:, 1:]], axis=1),
            jnp.concatenate([dot.lo[:, None], rest.lo[:, 1:]], axis=1),
        )
        pieces.append(out)
    return _flat(pieces)


def jdiv(layout: ConeLayout, lam: DD, d: DD) -> DD:
    pieces = [ddm.div(_orth(layout, d), _orth(layout, lam))]
    for lb, db in zip(_views(layout, lam), _views(layout, d)):
        det = _jdet(lb)
        l0 = DD(lb.hi[:, 0], lb.lo[:, 0])
        d0 = DD(db.hi[:, 0], db.lo[:, 0])
        full = dd_dot(lb, db, axis=1)
        l1d1 = ddm.sub(full, ddm.mul(l0, d0))
        u0 = ddm.div(ddm.sub(ddm.mul(l0, d0), l1d1), det)  # (nb,)
        u0c = DD(u0.hi[:, None], u0.lo[:, None])
        u1 = ddm.div(
            ddm.sub(db, ddm.mul(u0c, lb)), DD(l0.hi[:, None], l0.lo[:, None])
        )
        pieces.append(
            DD(
                jnp.concatenate([u0.hi[:, None], u1.hi[:, 1:]], axis=1),
                jnp.concatenate([u0.lo[:, None], u1.lo[:, 1:]], axis=1),
            )
        )
    return _flat(pieces)


def lambda_min(layout: ConeLayout, u: DD) -> jax.Array:
    """Smallest Jordan eigenvalue (f32 scalar; dd-accurate internally)."""
    vals = []
    if layout.l:
        vals.append(jnp.min(_orth(layout, u).hi))
    for ub in _views(layout, u):
        sq = ddm.mul(ub, ub)
        tail = DD(sq.hi.at[:, 0].set(0.0), sq.lo.at[:, 0].set(0.0))
        n1 = ddm.sqrt(dd_sum(tail, axis=1))
        lm = ddm.sub(DD(ub.hi[:, 0], ub.lo[:, 0]), n1)
        vals.append(jnp.min(lm.hi))
    return jnp.min(jnp.stack(vals)) if vals else jnp.float32(jnp.inf)


def eig_clip_delta(layout: ConeLayout, v: DD, lo, hi) -> DD:
    """clip(v, [lo, hi]) - v in the Jordan spectral sense (see
    ops.eig_clip_delta).  Hi-word f32 arithmetic throughout — the Gondzio
    corrector target this feeds is a centrality heuristic, and the delta
    is exactly zero on in-band blocks, so no dd accuracy is needed."""
    vo = _orth(layout, v).hi
    pieces = [ddm.from_f32(jnp.clip(vo, lo, hi) - vo)]
    for vb_dd in _views(layout, v):
        vb = vb_dd.hi
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
        pieces.append(ddm.from_f32(out))
    return _flat(pieces)


def max_step(layout: ConeLayout, u: DD, du: DD) -> jax.Array:
    """sup{alpha >= 0 : u + alpha du in K} (f32 scalar; see ops.max_step)."""
    inf = jnp.float32(jnp.inf)
    alphas = []
    if layout.l:
        uo, duo = _orth(layout, u), _orth(layout, du)
        cand = jnp.where(duo.hi < 0, -(uo.hi / duo.hi), inf)
        alphas.append(jnp.min(cand))
    for ub, db in zip(_views(layout, u), _views(layout, du)):
        a = _jdet(db)
        u0 = DD(ub.hi[:, 0], ub.lo[:, 0])
        d0 = DD(db.hi[:, 0], db.lo[:, 0])
        full = dd_dot(ub, db, axis=1)
        # u'J du = 2 u0 d0 - u'du
        uJdu = ddm.sub(ddm.mul_f32(ddm.mul(u0, d0), jnp.float32(2.0)), full)
        b = ddm.mul_f32(uJdu, jnp.float32(2.0))
        c = _jdet(ub)
        # disc = b^2 - 4ac in dd (cancellation-sensitive)
        disc = ddm.sub(
            ddm.mul(b, b), ddm.mul_f32(ddm.mul(a, c), jnp.float32(4.0))
        )
        disc_pos = DD(
            jnp.maximum(disc.hi, 0.0),
            jnp.where(disc.hi > 0, disc.lo, 0.0),
        )
        sq = ddm.sqrt(disc_pos)
        denom = ddm.add(b.neg(), sq)
        valid = ((a.hi < 0) | ((b.hi < 0) & (disc.hi >= 0))) & (denom.hi > 0)
        safe_denom = jnp.where(denom.hi > 0, denom.hi, 1.0) + denom.lo
        cand = jnp.where(valid, 2.0 * c.hi / safe_denom, inf)
        alphas.append(jnp.min(cand))
    return jnp.min(jnp.stack(alphas)) if alphas else inf


def max_step_pair(layout: ConeLayout, u: DD, d1: DD, d2: DD) -> jax.Array:
    """min(max_step(u, d1), max_step(u, d2)) in ONE sweep.

    The two boundary steps of a Mehrotra iteration (scaled ds and dz
    against lam) are independent; computing them as one vmapped pass
    halves the latency-bound reduction chain (the per-bucket dd dots and
    min-trees are tiny at lockstep batch sizes, so the cost is kernel
    count, not flops)."""
    d = DD(jnp.stack([d1.hi, d2.hi]), jnp.stack([d1.lo, d2.lo]))
    steps = jax.vmap(lambda dk: max_step(layout, u, dk))(d)
    return jnp.min(steps)


class DDScaling(NamedTuple):
    """NT scaling state in dd (mirrors cones.ops.Scaling).

    wbars (= v∘v, unit Jordan det) are kept alongside vs: the structured
    KKT assembly and the fused W^2/W^-2 operators (apply_W2/apply_Winv2)
    read W^2 = eta^2 P(wbar) and W^-2 = eta^-2 P(J wbar) directly, saving
    one cone-op pass wherever W was previously applied twice."""

    w_orth: DD                  # (l,)
    etas: tuple[DD, ...]        # per bucket (nb,)
    vs: tuple[DD, ...]          # per bucket (nb, q_pad)
    wbars: tuple[DD, ...]       # per bucket (nb, q_pad)
    lam: DD                     # (m_pad,)


def nt_scale(layout: ConeLayout, s: DD, z: DD) -> DDScaling:
    so, zo = _orth(layout, s), _orth(layout, z)
    w_orth = ddm.sqrt(ddm.div(so, zo))
    lam_pieces = [ddm.sqrt(ddm.mul(so, zo))]
    etas, vs, wbars = [], [], []
    for sb, zb in zip(_views(layout, s), _views(layout, z)):
        dets = _jdet(sb)
        detz = _jdet(zb)
        rs = ddm.sqrt(dets)
        rz = ddm.sqrt(detz)
        sbar = ddm.div(sb, DD(rs.hi[:, None], rs.lo[:, None]))
        zbar = ddm.div(zb, DD(rz.hi[:, None], rz.lo[:, None]))
        szdot = dd_dot(sbar, zbar, axis=1)
        gamma = ddm.sqrt(
            ddm.mul_f32(ddm.add_f32(szdot, jnp.float32(1.0)), jnp.float32(0.5))
        )
        wbar = ddm.div(
            ddm.add(sbar, _J(zbar)),
            DD(2.0 * gamma.hi[:, None], 2.0 * gamma.lo[:, None]),
        )
        w0 = DD(wbar.hi[:, 0], wbar.lo[:, 0])
        w0p = ddm.add_f32(w0, jnp.float32(1.0))   # dd-exact w0 + 1
        vden = ddm.sqrt(ddm.mul_f32(w0p, jnp.float32(2.0)))
        wb_plus_e = DD(
            wbar.hi.at[:, 0].set(w0p.hi), wbar.lo.at[:, 0].set(w0p.lo)
        )
        v = ddm.div(wb_plus_e, DD(vden.hi[:, None], vden.lo[:, None]))
        eta = ddm.sqrt(ddm.sqrt(ddm.div(dets, detz)))
        etas.append(eta)
        vs.append(v)
        wbars.append(wbar)
        # lambda = W z = eta (2 v (v'z) - J z)
        vz = dd_dot(v, zb, axis=1)
        lam_b = ddm.mul(
            DD(eta.hi[:, None], eta.lo[:, None]),
            ddm.sub(
                ddm.mul_f32(
                    ddm.mul(v, DD(vz.hi[:, None], vz.lo[:, None])),
                    jnp.float32(2.0),
                ),
                _J(zb),
            ),
        )
        lam_pieces.append(lam_b)
    return DDScaling(w_orth=w_orth, etas=tuple(etas), vs=tuple(vs),
                     wbars=tuple(wbars), lam=_flat(lam_pieces))


def _apply(layout: ConeLayout, sc: DDScaling, u: DD, inverse: bool) -> DD:
    if inverse:
        pieces = [ddm.div(_orth(layout, u), sc.w_orth)]
    else:
        pieces = [ddm.mul(_orth(layout, u), sc.w_orth)]
    for ub, eta, v in zip(_views(layout, u), sc.etas, sc.vs):
        g = _J(v) if inverse else v
        gu = dd_dot(g, ub, axis=1)
        core = ddm.sub(
            ddm.mul_f32(
                ddm.mul(g, DD(gu.hi[:, None], gu.lo[:, None])),
                jnp.float32(2.0),
            ),
            _J(ub),
        )
        etac = DD(eta.hi[:, None], eta.lo[:, None])
        pieces.append(ddm.div(core, etac) if inverse else ddm.mul(core, etac))
    return _flat(pieces)


def apply_W(layout: ConeLayout, sc: DDScaling, u: DD) -> DD:
    return _apply(layout, sc, u, inverse=False)


def apply_Winv(layout: ConeLayout, sc: DDScaling, u: DD) -> DD:
    return _apply(layout, sc, u, inverse=True)


def _apply2(layout: ConeLayout, sc: DDScaling, u: DD, inverse: bool) -> DD:
    """W^2 u (or W^-2 u) in ONE cone-op pass.

    W^2 = eta^2 P(wbar) and W^-2 = eta^-2 P(wbar^-1) with wbar^-1 = J wbar
    (unit Jordan det), both P(g)u = 2 g (g'u) - J u — the same diag+rank-1
    shape as apply_W, so squaring W costs one pass instead of two."""
    w2 = ddm.mul(sc.w_orth, sc.w_orth)
    uo = _orth(layout, u)
    pieces = [ddm.div(uo, w2) if inverse else ddm.mul(uo, w2)]
    for ub, eta, wb in zip(_views(layout, u), sc.etas, sc.wbars):
        g = _J(wb) if inverse else wb
        gu = dd_dot(g, ub, axis=1)
        core = ddm.sub(
            ddm.mul_f32(
                ddm.mul(g, DD(gu.hi[:, None], gu.lo[:, None])),
                jnp.float32(2.0),
            ),
            _J(ub),
        )
        eta2 = ddm.mul(eta, eta)
        e2c = DD(eta2.hi[:, None], eta2.lo[:, None])
        pieces.append(ddm.div(core, e2c) if inverse else ddm.mul(core, e2c))
    return _flat(pieces)


def apply_W2(layout: ConeLayout, sc: DDScaling, u: DD) -> DD:
    """W'W u = W^2 u (W symmetric) — one pass."""
    return _apply2(layout, sc, u, inverse=False)


def apply_Winv2(layout: ConeLayout, sc: DDScaling, u: DD) -> DD:
    """W^-2 u — one pass."""
    return _apply2(layout, sc, u, inverse=True)


def winv2_rho(layout: ConeLayout, sc: DDScaling) -> DD:
    """Diagonal part of W^-2 as an (m_pad,) row-weight vector.

    G' W^-2 G = G' diag(rho) G + 2 sum_b eta_b^-2 u_b u_b' with
    u_b = G_b' (J wbar_b): per SOC block the -eta^-2 J term contributes
    rho = (-eta^-2 on the head row, +eta^-2 on the tails); orthant rows
    carry w^-2.  Lets the condensed KKT matrix be assembled from CONSTANT
    presliced G (one dd mul + one peel per iteration) instead of slicing
    W^-1 G afresh every iteration."""
    one = ddm.from_f32(jnp.ones_like(sc.w_orth.hi))
    pieces = [ddm.div(one, ddm.mul(sc.w_orth, sc.w_orth))]
    for bkt, eta in zip(layout.buckets, sc.etas):
        e2 = ddm.div(
            ddm.from_f32(jnp.ones_like(eta.hi)), ddm.mul(eta, eta)
        )                                                  # (nb,)
        sign = jnp.ones((1, bkt.q_pad), jnp.float32).at[0, 0].set(-1.0)
        blk = ddm.mul_f32(DD(e2.hi[:, None], e2.lo[:, None]), sign)
        pieces.append(blk)
    return _flat(pieces)


def winv2_columns(layout: ConeLayout, sc: DDScaling):
    """Rank-correction generators for the structured KKT assembly.

    Returns (V, w2) with V (m_pad, NB) dd — column b holds wbar_b^-1 =
    J wbar_b on block b's padded rows, zero elsewhere — and w2 (NB,) dd
    = 2 eta_b^-2, so that G' W^-2 G = G' diag(winv2_rho) G
    + (G'V) diag(w2) (G'V)'.  NB = total SOC block count (static)."""
    nb_total = sum(b.n_blocks for b in layout.buckets)
    col_pieces_hi, col_pieces_lo, w2s = [], [], []
    if layout.l:
        col_pieces_hi.append(jnp.zeros((layout.l, nb_total), jnp.float32))
        col_pieces_lo.append(jnp.zeros((layout.l, nb_total), jnp.float32))
    col0 = 0
    for bkt, eta, wb in zip(layout.buckets, sc.etas, sc.wbars):
        winv = _J(wb)                                       # (nb, q_pad)
        nb = bkt.n_blocks
        eye = jnp.eye(nb, dtype=jnp.float32)
        # (nb, q_pad, nb): block i's vector in column col0 + i
        blk_hi = winv.hi[:, :, None] * eye[:, None, :]
        blk_lo = winv.lo[:, :, None] * eye[:, None, :]
        pad_l = col0
        pad_r = nb_total - col0 - nb
        blk_hi = jnp.pad(blk_hi.reshape(bkt.size, nb),
                         ((0, 0), (pad_l, pad_r)))
        blk_lo = jnp.pad(blk_lo.reshape(bkt.size, nb),
                         ((0, 0), (pad_l, pad_r)))
        col_pieces_hi.append(blk_hi)
        col_pieces_lo.append(blk_lo)
        e2 = ddm.div(ddm.from_f32(jnp.full_like(eta.hi, 2.0)),
                     ddm.mul(eta, eta))
        w2s.append(e2)
        col0 += nb
    V = DD(jnp.concatenate(col_pieces_hi, axis=0),
           jnp.concatenate(col_pieces_lo, axis=0))
    w2 = DD(jnp.concatenate([w.hi for w in w2s]),
            jnp.concatenate([w.lo for w in w2s])) if w2s else None
    return V, w2


def scale_rows_Winv(layout: ConeLayout, sc: DDScaling, G: DD) -> DD:
    """W^-1 G for a dd (m_pad, n) matrix (rank-1 + diag per SOC block)."""
    n = G.hi.shape[1]
    l = layout.l
    pieces = [
        ddm.div(G[:l], DD(sc.w_orth.hi[:, None], sc.w_orth.lo[:, None]))
    ]
    for bkt, eta, v in zip(layout.buckets, sc.etas, sc.vs):
        Gb = DD(
            G.hi[bkt.offset : bkt.offset + bkt.size].reshape(
                bkt.n_blocks, bkt.q_pad, n
            ),
            G.lo[bkt.offset : bkt.offset + bkt.size].reshape(
                bkt.n_blocks, bkt.q_pad, n
            ),
        )
        jv = _J(v)
        jv3 = DD(jv.hi[:, :, None], jv.lo[:, :, None])
        t = dd_sum(ddm.mul(jv3, Gb), axis=1)           # (nb, n) = (Jv)'G_b
        JGb = DD(
            jnp.concatenate([Gb.hi[:, :1, :], -Gb.hi[:, 1:, :]], axis=1),
            jnp.concatenate([Gb.lo[:, :1, :], -Gb.lo[:, 1:, :]], axis=1),
        )
        outer = ddm.mul_f32(
            ddm.mul(jv3, DD(t.hi[:, None, :], t.lo[:, None, :])),
            jnp.float32(2.0),
        )
        out = ddm.div(
            ddm.sub(outer, JGb),
            DD(eta.hi[:, None, None], eta.lo[:, None, None]),
        )
        pieces.append(DD(out.hi.reshape(bkt.size, n), out.lo.reshape(bkt.size, n)))
    return DD(
        jnp.concatenate([p.hi for p in pieces], axis=0),
        jnp.concatenate([p.lo for p in pieces], axis=0),
    )


def identity_scaling(layout: ConeLayout) -> DDScaling:
    """W = I (initialization)."""
    etas, vs, wbars = [], [], []
    for b in layout.buckets:
        etas.append(ddm.from_f32(jnp.ones((b.n_blocks,), jnp.float32)))
        v = jnp.zeros((b.n_blocks, b.q_pad), jnp.float32).at[:, 0].set(1.0)
        vs.append(ddm.from_f32(v))
        wbars.append(ddm.from_f32(v))
    return DDScaling(
        w_orth=ddm.from_f32(jnp.ones((layout.l,), jnp.float32)),
        etas=tuple(etas),
        vs=tuple(vs),
        wbars=tuple(wbars),
        lam=identity(layout),
    )
