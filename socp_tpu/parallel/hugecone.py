"""HUGE cones sharded across the mesh, dd32-native (SURVEY.md section 5,
long-context row, plan item (a)).

The solver analog of sequence parallelism: an SOCP whose constraint vector
is too long for one device's comfort —

    minimize c'x   s.t.  A x = b,  G x + s = h,   s in R+^l x Q^q1 x ... x Q^qN

with l + sum(q_i) = m huge and n (and p, N) modest.  The m-dimensional
rows of G and every m-vector (s, z, h, residuals, directions) are sharded
over a mesh axis; x, y and the condensed n x n system stay replicated.
Per SURVEY the cone kernels become local elementwise work + ONE reduction
each:

  * SOC state is (head, tail): the head coordinate u0 of each of the N
    SOCs is REPLICATED (an (N,) vector), the (q_i - 1)-tails are sharded
    as an (N, t_loc) block — every Jordan-algebra quantity (det, arrow
    product, NT point, max-step quadratic) is then head-vector arithmetic
    plus a device-summed tail dot;
  * the condensed KKT is the tall-skinny Gram H = (W^-1 G)'(W^-1 G):
    each shard Grams its own rows via the Ozaki bf16-MXU scheme, ONE
    (n, n) reduction combines them, chol(H) runs replicated in dd32 — no
    device ever materializes full G'G traffic;
  * p coupling equalities ride a replicated (p, p) Schur complement of H
    (p << n), exactly as kkt/dd_dense.py.

dd32-NATIVE (round-2 verdict missing #2): every carry, cone kernel, Gram,
Cholesky, substitution, and refinement matvec runs in double-word f32 —
the TPU-fast path; no emulated f64 anywhere in the hot loop.  Device
reductions preserve dd accuracy AND the shard_map replication type: local
partials are all_gather'd (ndev-1 ICI ring hops, invariant-typed output)
and pairwise dd-summed in fixed index order, so every device holds
bitwise-identical replicated values (same construction as
parallel/collectives.ring_allreduce).

Driver parity (round-2 verdict weak #8): stall guard on refinement
quality, best-iterate restore, relaxed "optimal, inaccurate" acceptance,
relaxed exit certificates, history collection — mirrors ipm/dd_driver.py
step-for-step.

Scope notes: all SOC tails are padded to a common per-device length, so
this path suits one-to-a-few comparable huge cones (the bucketed batched
paths cover many small heterogeneous cones); warm starts are not plumbed
here (cold init is a negligible fraction of a huge-cone solve).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from socp_tpu.config import DEFAULT_CONFIG, SolverConfig
from socp_tpu.cones.dd_ops import dd_sum
from socp_tpu.kkt.dd_dense import DDEqChol, _dd_eq_chol
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD
from socp_tpu.ops.ozaki import dd_matmul, preslice, sliced_gram, sliced_matmul
from socp_tpu.solution import Status

try:  # public alias pending; pinned jax 0.9.0 has it in _src
    from jax.lax import all_gather_invariant  # type: ignore
except ImportError:  # pragma: no cover - version-dependent import path
    from jax._src.lax.parallel import all_gather_invariant


class HV(NamedTuple):
    """A sharded dd member of R^l x Q^q1 x ... x Q^qN: orthant shard,
    replicated head vector, sharded tail block."""

    orth: DD     # (l_loc,)
    head: DD     # (N,) replicated
    tail: DD     # (N, t_loc)


def _hmap(f, *vs: HV) -> HV:
    return HV(*(f(*parts) for parts in zip(*vs)))


def _core(cfg: SolverConfig, axis: str, ndev: int, n_soc: int, p: int,
          c64, Go64, GH64, Gt64, ho64, hH64, ht64, A64, b64):
    """SPMD body under shard_map.  Go: (l_loc, n) orthant rows; GH: (N, n)
    SOC head rows (replicated); Gt: (N, t_loc, n) SOC tail rows."""
    n = c64.shape[0]
    l_loc = ho64.shape[0]
    t_loc = ht64.shape[1]

    to_dd = (ddm.from_f64 if c64.dtype == jnp.float64
             else lambda a: ddm.from_f32(a.astype(jnp.float32)))
    c = to_dd(c64)
    G_o = to_dd(Go64)
    G_H = to_dd(GH64)
    G_t = to_dd(Gt64)
    h = HV(to_dd(ho64), to_dd(hH64), to_dd(ht64))
    A = to_dd(A64)
    b = to_dd(b64)

    # ---- dd device reductions (bitwise replicated, invariant-typed) ----
    def dd_allsum(v: DD) -> DD:
        if ndev <= 1:
            return v
        g = DD(all_gather_invariant(v.hi, axis),
               all_gather_invariant(v.lo, axis))
        return dd_sum(g, axis=0)      # fixed order 0..ndev-1: bitwise equal

    def pmin(v):
        return lax.pmin(v, axis) if ndev > 1 else v

    def tdots(*pairs) -> list[DD]:
        """Per-SOC tail dots for several (u, v) HV pairs with ONE gather:
        stack the local (N,) partials, reduce, unstack."""
        loc = [dd_sum(ddm.mul(u.tail, v.tail), axis=1) for u, v in pairs]
        stk = DD(jnp.stack([d.hi for d in loc]), jnp.stack([d.lo for d in loc]))
        red = dd_allsum(stk)
        return [DD(red.hi[i], red.lo[i]) for i in range(len(pairs))]

    def orth_dot(u: HV, v: HV) -> DD:
        if l_loc == 0:
            z = jnp.zeros((), jnp.float32)
            return DD(z, z)
        return dd_sum(ddm.mul(u.orth, v.orth), axis=0)

    def vdot(u: HV, v: HV) -> DD:
        """Full inner product: one scalar reduction + replicated head dot."""
        loc_t = dd_sum(dd_sum(ddm.mul(u.tail, v.tail), axis=1), axis=0)
        loc = ddm.add(orth_dot(u, v), loc_t)
        tot = dd_allsum(loc)
        return ddm.add(tot, dd_sum(ddm.mul(u.head, v.head), axis=0))

    def vnorm(u: HV) -> jax.Array:
        return jnp.sqrt(jnp.maximum(vdot(u, u).hi, 0.0))

    def vadd(u: HV, v: HV) -> HV:
        return _hmap(ddm.add, u, v)

    def vsub(u: HV, v: HV) -> HV:
        return _hmap(ddm.sub, u, v)

    def vneg(u: HV) -> HV:
        return HV(u.orth.neg(), u.head.neg(), u.tail.neg())

    def axpy(u: HV, a, d: HV) -> HV:
        return _hmap(lambda x, y: ddm.add(x, ddm.mul_f32(y, a)), u, d)

    def hwhere(mask, u: HV, v: HV) -> HV:
        return _hmap(lambda x, y: ddm.where(mask, x, y), u, v)

    one_l = ddm.from_f32(jnp.ones((l_loc,), jnp.float32))
    e = HV(one_l, ddm.from_f32(jnp.ones((n_soc,), jnp.float32)),
           ddm.from_f32(jnp.zeros((n_soc, t_loc), jnp.float32)))
    zero_hv = HV(ddm.from_f32(jnp.zeros((l_loc,), jnp.float32)),
                 ddm.from_f32(jnp.zeros((n_soc,), jnp.float32)),
                 ddm.from_f32(jnp.zeros((n_soc, t_loc), jnp.float32)))

    l_tot = ndev * l_loc                        # padded orthant coords all live
    nu = jnp.float32(float(l_tot + n_soc))

    def _col(x: DD) -> DD:                      # (k,) -> (k, 1)
        return DD(x.hi[:, None], x.lo[:, None])

    # ---- Jordan algebra on (head, tail) SOC blocks ---------------------
    def soc_det(u: HV, utu: DD) -> DD:
        """det = u0^2 - ||u1||^2 given the reduced tail dot utu (N,)."""
        return ddm.sub(ddm.mul(u.head, u.head), utu)

    def jprod(u: HV, v: HV, utv: DD) -> HV:
        full = ddm.add(ddm.mul(u.head, v.head), utv)
        tail = ddm.add(ddm.mul(_col(u.head), v.tail),
                       ddm.mul(_col(v.head), u.tail))
        return HV(ddm.mul(u.orth, v.orth), full, tail)

    def jdiv(lam: HV, d: HV, ltl: DD, ltd: DD) -> HV:
        det = soc_det(lam, ltl)
        l0d0 = ddm.mul(lam.head, d.head)
        u0 = ddm.div(ddm.sub(l0d0, ltd), det)
        tail = ddm.div(ddm.sub(d.tail, ddm.mul(_col(u0), lam.tail)),
                       _col(lam.head))
        return HV(ddm.div(d.orth, lam.orth), u0, tail)

    def lambda_min(u: HV, utu: DD) -> jax.Array:
        mo = (pmin(jnp.min(u.orth.hi)) if l_loc
              else jnp.float32(jnp.inf))
        n1 = ddm.sqrt(DD(jnp.maximum(utu.hi, 0.0),
                         jnp.where(utu.hi > 0, utu.lo, 0.0)))
        return jnp.minimum(mo, jnp.min(ddm.sub(u.head, n1).hi))

    def max_step(u: HV, du: HV, utu: DD, dtd: DD, utd: DD) -> jax.Array:
        """sup{alpha >= 0 : u + alpha du in K}; tail dots pre-reduced."""
        inf = jnp.float32(jnp.inf)
        if l_loc:
            cand = jnp.where(du.orth.hi < 0, -(u.orth.hi / du.orth.hi), inf)
            a_o = pmin(jnp.min(cand))
        else:
            a_o = inf
        a = soc_det(du, dtd)
        uJdu = ddm.sub(ddm.mul(u.head, du.head), utd)
        bq = ddm.mul_f32(uJdu, jnp.float32(2.0))
        cq = soc_det(u, utu)
        disc = ddm.sub(ddm.mul(bq, bq),
                       ddm.mul_f32(ddm.mul(a, cq), jnp.float32(4.0)))
        disc_pos = DD(jnp.maximum(disc.hi, 0.0),
                      jnp.where(disc.hi > 0, disc.lo, 0.0))
        sq = ddm.sqrt(disc_pos)
        denom = ddm.add(bq.neg(), sq)
        valid = ((a.hi < 0) | ((bq.hi < 0) & (disc.hi >= 0))) & (denom.hi > 0)
        safe = jnp.where(denom.hi > 0, denom.hi, 1.0) + denom.lo
        cand_s = jnp.where(valid, 2.0 * cq.hi / safe, inf)
        return jnp.minimum(a_o, jnp.min(cand_s))

    # ---- NT scaling, head/tail dd form (SURVEY Appendix A) -------------
    class HScal(NamedTuple):
        w_orth: DD               # (l_loc,)
        eta: DD                  # (N,) replicated
        v: HV                    # NT point sqrt (orth unused)
        lam: HV

    def nt_scale(s: HV, z: HV) -> HScal:
        w_orth = ddm.sqrt(ddm.div(s.orth, z.orth))
        sts, ztz, stz = tdots((s, s), (z, z), (s, z))
        dets = soc_det(s, sts)
        detz = soc_det(z, ztz)
        rs = ddm.sqrt(dets)
        rz = ddm.sqrt(detz)
        # sbar = s / rs, zbar = z / rz (heads+tails; orthant unused)
        # gamma^2 = (1 + zbar'sbar)/2 with the SOC inner product:
        # zbar'sbar = (s0 z0 + s1'z1)/(rs rz)
        szb = ddm.div(ddm.add(ddm.mul(s.head, z.head), stz),
                      ddm.mul(rs, rz))
        gamma = ddm.sqrt(ddm.mul_f32(ddm.add_f32(szb, jnp.float32(1.0)),
                                     jnp.float32(0.5)))
        tg = ddm.mul_f32(gamma, jnp.float32(2.0))
        # wbar = (sbar + J zbar) / (2 gamma)
        wb_head = ddm.div(ddm.add(ddm.div(s.head, rs), ddm.div(z.head, rz)),
                          tg)
        wb_tail = ddm.div(
            ddm.sub(ddm.div(s.tail, _col(rs)), ddm.div(z.tail, _col(rz))),
            _col(tg))
        w0p = ddm.add_f32(wb_head, jnp.float32(1.0))
        vden = ddm.sqrt(ddm.mul_f32(w0p, jnp.float32(2.0)))
        v = HV(w_orth, ddm.div(w0p, vden), ddm.div(wb_tail, _col(vden)))
        eta = ddm.sqrt(ddm.sqrt(ddm.div(dets, detz)))
        # lam = W z = eta (2 v (v'z) - J z)
        (vtz,) = tdots((v, z))
        vz = ddm.add(ddm.mul(v.head, z.head), vtz)
        lam_head = ddm.mul(eta, ddm.sub(
            ddm.mul_f32(ddm.mul(v.head, vz), jnp.float32(2.0)), z.head))
        lam_tail = ddm.mul(_col(eta), ddm.add(
            ddm.mul_f32(ddm.mul(v.tail, _col(vz)), jnp.float32(2.0)),
            z.tail))
        lam = HV(ddm.sqrt(ddm.mul(s.orth, z.orth)), lam_head, lam_tail)
        return HScal(w_orth=w_orth, eta=eta, v=v, lam=lam)

    def apply_W(sc: HScal, u: HV) -> HV:
        (vtu,) = tdots((sc.v, u))
        vu = ddm.add(ddm.mul(sc.v.head, u.head), vtu)
        head = ddm.mul(sc.eta, ddm.sub(
            ddm.mul_f32(ddm.mul(sc.v.head, vu), jnp.float32(2.0)), u.head))
        tail = ddm.mul(_col(sc.eta), ddm.add(
            ddm.mul_f32(ddm.mul(sc.v.tail, _col(vu)), jnp.float32(2.0)),
            u.tail))
        return HV(ddm.mul(sc.w_orth, u.orth), head, tail)

    def apply_Winv(sc: HScal, u: HV) -> HV:
        # W^-1 = eta^-1 P(Jv): (Jv)'u = v0 u0 - v1'u1
        (vtu,) = tdots((sc.v, u))
        jvu = ddm.sub(ddm.mul(sc.v.head, u.head), vtu)
        head = ddm.div(ddm.sub(
            ddm.mul_f32(ddm.mul(sc.v.head, jvu), jnp.float32(2.0)), u.head),
            sc.eta)
        tail = ddm.div(ddm.sub(
            u.tail,
            ddm.mul_f32(ddm.mul(sc.v.tail, _col(jvu)), jnp.float32(2.0))),
            _col(sc.eta))
        return HV(ddm.div(u.orth, sc.w_orth), head, tail)

    # ---- constant problem data presliced once (residual matvecs) -------
    rows_loc = l_loc + n_soc * t_loc

    def _flat_rows(orth_m: DD, tail_m: DD) -> DD:
        """(l_loc, n) + (N, t_loc, n) -> (rows_loc, n) local row block."""
        return DD(
            jnp.concatenate([orth_m.hi, tail_m.hi.reshape(-1, n)], axis=0),
            jnp.concatenate([orth_m.lo, tail_m.lo.reshape(-1, n)], axis=0),
        )

    def _split_rows(v: DD) -> tuple[DD, DD]:
        """(rows_loc, ...) -> (l_loc, ...), (N, t_loc, ...)."""
        o = v[:l_loc]
        t = v[l_loc:]
        return o, DD(t.hi.reshape(n_soc, t_loc, *t.hi.shape[1:]),
                     t.lo.reshape(n_soc, t_loc, *t.lo.shape[1:]))

    G_rows = _flat_rows(G_o, G_t)
    G_rows_s = preslice(G_rows)          # (rows_loc, n):  v -> G_loc v
    G_rowsT_s = preslice(G_rows.T)       # (n, rows_loc):  u -> G_loc' u
    A_s = preslice(A) if p else None
    AT_s = preslice(A.T) if p else None

    def smv(sl, v: DD) -> DD:
        out = sliced_matmul(sl, DD(v.hi[:, None], v.lo[:, None]))
        return DD(out.hi[:, 0], out.lo[:, 0])

    def G_mv(x: DD) -> HV:
        loc = smv(G_rows_s, x)
        o, t = _split_rows(loc)
        head = dd_matmul(G_H, DD(x.hi[:, None], x.lo[:, None]))
        return HV(o, DD(head.hi[:, 0], head.lo[:, 0]),
                  DD(t.hi[..., 0] if t.hi.ndim == 3 else t.hi,
                     t.lo[..., 0] if t.lo.ndim == 3 else t.lo))

    def GT_mv(u: HV) -> DD:
        uloc = DD(
            jnp.concatenate([u.orth.hi, u.tail.hi.reshape(-1)]),
            jnp.concatenate([u.orth.lo, u.tail.lo.reshape(-1)]),
        )
        loc = smv(G_rowsT_s, uloc)
        tot = dd_allsum(loc)
        hd = dd_matmul(G_H.T, DD(u.head.hi[:, None], u.head.lo[:, None]))
        return ddm.add(tot, DD(hd.hi[:, 0], hd.lo[:, 0]))

    # ---- KKT: sharded tall-skinny Ozaki Gram, replicated dd chol -------
    class Factored(NamedTuple):
        L_H: DDEqChol
        L_S: DDEqChol
        Gh_rows_s: object        # presliced (rows_loc, n)
        Gh_rowsT_s: object       # presliced (n, rows_loc)
        Gh_H: DD                 # (N, n) replicated head rows
        scaling: HScal

    def scale_rows_Winv(sc: HScal):
        """Ghat = W^-1 G rowwise.  SOC rows need t = (Jv)'G per cone:
        v0 g0 - V1'G1, an (N, n) reduced tall matvec."""
        # local tail contribution V1'G1 via dd elementwise+sum (the tails
        # of v change every iteration, so no constant preslice applies;
        # one pass over (N, t_loc, n))
        vtG_loc = dd_sum(ddm.mul(
            DD(sc.v.tail.hi[:, :, None], sc.v.tail.lo[:, :, None]),
            G_t), axis=1)                                   # (N, n)
        vtG = dd_allsum(vtG_loc)
        t_vec = ddm.sub(ddm.mul(_col(sc.v.head), G_H), vtG)  # (N, n)
        Gh_o = ddm.div(G_o, DD(sc.w_orth.hi[:, None], sc.w_orth.lo[:, None]))
        Gh_H = ddm.div(ddm.sub(
            ddm.mul_f32(ddm.mul(_col(sc.v.head), t_vec), jnp.float32(2.0)),
            G_H), DD(sc.eta.hi[:, None], sc.eta.lo[:, None]))
        Gh_t = ddm.div(ddm.add(
            ddm.mul_f32(ddm.mul(
                DD(sc.v.tail.hi[:, :, None], sc.v.tail.lo[:, :, None]),
                DD(t_vec.hi[:, None, :], t_vec.lo[:, None, :])),
                jnp.float32(-2.0)),
            G_t), DD(sc.eta.hi[:, None, None], sc.eta.lo[:, None, None]))
        return Gh_o, Gh_H, Gh_t

    def factor(sc: HScal) -> Factored:
        Gh_o, Gh_H, Gh_t = scale_rows_Winv(sc)
        Gh_rows = _flat_rows(Gh_o, Gh_t)
        Gh_rowsT_s = preslice(Gh_rows.T)
        Gh_rows_s = preslice(Gh_rows)
        H_loc = sliced_gram(Gh_rowsT_s)                     # (n, n) local
        H = dd_allsum(H_loc)
        H = ddm.add(H, dd_matmul(Gh_H.T, Gh_H))             # replicated rows
        L_H = _dd_eq_chol(H, cfg.delta_reg)
        if p:
            HinvAT = L_H.solve(A.T)
            S = dd_matmul(A, HinvAT)
            L_S = _dd_eq_chol(S, cfg.delta_reg)
        else:
            z2 = jnp.zeros((0, 0), jnp.float32)
            z1 = jnp.zeros((0,), jnp.float32)
            L_S = DDEqChol(L=DD(z2, z2), d=DD(z1, z1), LT=DD(z2, z2))
        return Factored(L_H=L_H, L_S=L_S, Gh_rows_s=Gh_rows_s,
                        Gh_rowsT_s=Gh_rowsT_s, Gh_H=Gh_H, scaling=sc)

    def Ghat_mv(f: Factored, x: DD) -> HV:
        loc = smv(f.Gh_rows_s, x)
        o, t = _split_rows(loc)
        hd = dd_matmul(f.Gh_H, DD(x.hi[:, None], x.lo[:, None]))
        return HV(o, DD(hd.hi[:, 0], hd.lo[:, 0]), t)

    def GhatT_mv(f: Factored, u: HV) -> DD:
        uloc = DD(
            jnp.concatenate([u.orth.hi, u.tail.hi.reshape(-1)]),
            jnp.concatenate([u.orth.lo, u.tail.lo.reshape(-1)]),
        )
        tot = dd_allsum(smv(f.Gh_rowsT_s, uloc))
        hd = dd_matmul(f.Gh_H.T, DD(u.head.hi[:, None], u.head.lo[:, None]))
        return ddm.add(tot, DD(hd.hi[:, 0], hd.lo[:, 0]))

    def kkt_solve_once(f: Factored, bx: DD, by: DD, bz: HV):
        """Condensed + (p, p) Schur for the equalities; dd throughout."""
        bhz = apply_Winv(f.scaling, bz)
        btx = ddm.add(bx, GhatT_mv(f, bhz))
        if p:
            t1 = f.L_H.solve(DD(btx.hi[:, None], btx.lo[:, None]))
            rhs_S = ddm.sub(dd_matmul(A, t1), DD(by.hi[:, None],
                                                 by.lo[:, None]))
            yhat = f.L_S.solve(rhs_S)
            corr = dd_matmul(A.T, yhat)
            dx2 = f.L_H.solve(ddm.sub(DD(btx.hi[:, None], btx.lo[:, None]),
                                      corr))
            dx = DD(dx2.hi[:, 0], dx2.lo[:, 0])
            dy = DD(yhat.hi[:, 0], yhat.lo[:, 0])
        else:
            dy = by
            dx2 = f.L_H.solve(DD(btx.hi[:, None], btx.lo[:, None]))
            dx = DD(dx2.hi[:, 0], dx2.lo[:, 0])
        dz = apply_Winv(f.scaling, vsub(Ghat_mv(f, dx), bhz))
        return dx, dy, dz

    def kkt_solve(f: Factored, bx: DD, by: DD, bz: HV):
        """Solve + refinement on the 3x3 residual; returns the
        post-refinement relative residual as the stall signal (driver
        parity: an unusable direction stops the solver instead of
        stepping)."""
        dx, dy, dz = kkt_solve_once(f, bx, by, bz)
        quality = jnp.zeros((), jnp.float32)
        if cfg.refine_steps <= 0:
            return dx, dy, dz, quality

        def nrm2(v: DD):
            return jnp.sum(v.hi * v.hi)

        def hnrm2(u: HV):
            """Local (sharded) squared norm: orthant shard + tail shard."""
            return nrm2(u.orth) + nrm2(u.tail)

        # replicated terms are divided by ndev BEFORE the psum so they
        # count once in the global norm
        rhs_loc = nrm2(bx) / jnp.float32(max(ndev, 1)) + hnrm2(bz)
        rhs_norm = jnp.sqrt(
            (lax.psum(rhs_loc, axis) if ndev > 1 else rhs_loc)
            + nrm2(bz.head) + (nrm2(by) if p else 0.0)
        ) + 1.0
        for _ in range(cfg.refine_steps):
            rx = ddm.sub(bx, GT_mv(dz))
            if p:
                rx = ddm.sub(rx, smv(AT_s, dy))
                ry = ddm.sub(by, smv(A_s, dx))
            else:
                ry = by
            WWdz = apply_W(f.scaling, apply_W(f.scaling, dz))
            rz = vsub(bz, vsub(G_mv(dx), WWdz))
            q_loc = nrm2(rx) / jnp.float32(max(ndev, 1)) + hnrm2(rz)
            quality = jnp.sqrt(
                (lax.psum(q_loc, axis) if ndev > 1 else q_loc)
                + nrm2(rz.head) + (nrm2(ry) if p else 0.0)
            ) / rhs_norm
            ex, ey, ez = kkt_solve_once(f, rx, ry, rz)
            dx = ddm.add(dx, ex)
            dy = ddm.add(dy, ey)
            dz = vadd(dz, ez)
        return dx, dy, dz, quality

    norm_b = jnp.maximum(1.0, jnp.sqrt(jnp.sum(b.hi * b.hi)))
    norm_h = jnp.maximum(1.0, vnorm(h))
    norm_c = jnp.maximum(1.0, jnp.sqrt(jnp.sum(c.hi * c.hi)))

    def residuals(x: DD, y: DD, s: HV, z: HV):
        rx = ddm.add(GT_mv(z), c)
        if p:
            rx = ddm.add(rx, smv(AT_s, y))
            ry = ddm.sub(smv(A_s, x), b)
        else:
            ry = b
        rz = vsub(vadd(G_mv(x), s), h)
        return rx, ry, rz

    # ---- init (W = I solves + interior shift) --------------------------
    id_v = HV(one_l, ddm.from_f32(jnp.ones((n_soc,), jnp.float32)),
              ddm.from_f32(jnp.zeros((n_soc, t_loc), jnp.float32)))
    sc0 = HScal(w_orth=one_l,
                eta=ddm.from_f32(jnp.ones((n_soc,), jnp.float32)),
                v=id_v, lam=e)
    f0 = factor(sc0)
    zero_n = ddm.from_f32(jnp.zeros((n,), jnp.float32))
    zero_p = ddm.from_f32(jnp.zeros((p,), jnp.float32))
    x0, _, z0m, _ = kkt_solve(f0, zero_n, b, h)
    shat = vneg(z0m)
    (shat_tt,) = tdots((shat, shat))
    ap = -lambda_min(shat, shat_tt)
    s0 = hwhere(ap < 0, shat, axpy(shat, 1.0 + ap, e))
    _, y0, zhat, _ = kkt_solve(f0, c.neg(), zero_p, zero_hv)
    (zhat_tt,) = tdots((zhat, zhat))
    ad = -lambda_min(zhat, zhat_tt)
    z0 = hwhere(ad < 0, zhat, axpy(zhat, 1.0 + ad, e))

    class St(NamedTuple):
        x: DD
        y: DD
        s: HV
        z: HV
        k: jax.Array
        status: jax.Array
        done: jax.Array
        best_merit: jax.Array
        bx: DD
        by: DD
        bs: HV
        bz_: HV
        hist: jax.Array

    n_hist = cfg.max_iter if cfg.collect_history else 0
    st0 = St(x=x0, y=y0, s=s0, z=z0,
             k=jnp.zeros((), jnp.int32),
             status=jnp.full((), Status.RUNNING, jnp.int32),
             done=jnp.zeros((), bool),
             best_merit=jnp.float32(jnp.inf),
             bx=x0, by=y0, bs=s0, bz_=z0,
             hist=jnp.zeros((n_hist, 6), jnp.float32))

    def metrics(x, y, s, z, rx, ry, rz):
        gap = vdot(s, z).hi
        pcost = dd_sum(ddm.mul(c, x), axis=0).hi
        dcost = (pcost + vdot(z, rz).hi - gap
                 + (dd_sum(ddm.mul(y, ry), axis=0).hi if p else 0.0))
        relgap = jnp.where(
            pcost < 0, gap / -pcost,
            jnp.where(dcost > 0, gap / dcost, jnp.inf))
        pres = jnp.maximum(
            (jnp.sqrt(jnp.sum(ry.hi * ry.hi)) / norm_b) if p else 0.0,
            vnorm(rz) / norm_h)
        dres = jnp.sqrt(jnp.sum(rx.hi * rx.hi)) / norm_c
        return gap, pcost, dcost, relgap, pres, dres

    def certificates(x, y, s, z, rx, ry, rz, feastol):
        """Approximate Farkas rays read off the residuals (driver parity):
        A'y + G'z = rx - c, Ax = ry + b, Gx + s = rz + h."""
        hz_by = vdot(h, z).hi + (dd_sum(ddm.mul(y, b), axis=0).hi
                                 if p else 0.0)
        pvec = ddm.sub(rx, c)
        pinf = (hz_by < 0) & (
            jnp.sqrt(jnp.sum(pvec.hi * pvec.hi)) <= feastol * -hz_by)
        cx = dd_sum(ddm.mul(c, x), axis=0).hi
        gx_s = vadd(rz, h)
        dres_c = jnp.maximum(
            jnp.sqrt(jnp.sum(ddm.add(ry, b).hi ** 2)) if p else 0.0,
            vnorm(gx_s))
        dinf = (cx < 0) & (dres_c <= feastol * -cx)
        return pinf, dinf

    def body(st: St) -> St:
        x, y, s, z = st.x, st.y, st.s, st.z
        rx, ry, rz = residuals(x, y, s, z)
        gap, pcost, dcost, relgap, pres, dres = metrics(
            x, y, s, z, rx, ry, rz)
        mu = gap / nu
        converged = (
            (pres <= cfg.feastol) & (dres <= cfg.feastol)
            & ((gap <= cfg.abstol) | (relgap <= cfg.reltol)))

        merit = jnp.maximum(jnp.maximum(pres, dres),
                            jnp.minimum(relgap, gap))
        better = (merit < st.best_merit) & ~st.done
        best_merit = jnp.where(better, merit, st.best_merit)
        bx = ddm.where(better, x, st.bx)
        by = ddm.where(better, y, st.by)
        bs = hwhere(better, s, st.bs)
        bz_ = hwhere(better, z, st.bz_)

        pinf, dinf = certificates(x, y, s, z, rx, ry, rz, cfg.feastol)

        sc = nt_scale(s, z)
        f = factor(sc)
        lam = sc.lam
        ltl, = tdots((lam, lam))

        def newton(d_s: HV, ltd: DD):
            dtil = jdiv(lam, d_s, ltl, ltd)
            rhs_z = vadd(vneg(rz), apply_W(sc, dtil))
            dx, dy, dz, quality = kkt_solve(f, rx.neg(), ry.neg(), rhs_z)
            dz_sc = apply_W(sc, dz)
            ds_sc = vneg(vadd(dtil, dz_sc))
            return dx, dy, dz, ds_sc, dz_sc, quality

        lam2 = jprod(lam, lam, ltl)
        (ltl2,) = tdots((lam, lam2))
        _, _, dz_a, ds_sc_a, dz_sc_a, _ = newton(lam2, ltl2)
        dsa_dsa, dza_dza, l_dsa, l_dza, dsa_dza = tdots(
            (ds_sc_a, ds_sc_a), (dz_sc_a, dz_sc_a),
            (lam, ds_sc_a), (lam, dz_sc_a), (ds_sc_a, dz_sc_a))
        alpha_a = jnp.minimum(1.0, jnp.minimum(
            max_step(lam, ds_sc_a, ltl, dsa_dsa, l_dsa),
            max_step(lam, dz_sc_a, ltl, dza_dza, l_dza)))
        gap_a = vdot(axpy(lam, alpha_a, ds_sc_a),
                     axpy(lam, alpha_a, dz_sc_a)).hi
        sigma = jnp.clip(gap_a / gap, 0.0, 1.0) ** 3

        d_s = vsub(vadd(lam2, jprod(ds_sc_a, dz_sc_a, dsa_dza)),
                   _hmap(lambda ee: ddm.mul_f32(ee, sigma * mu), e))
        (ltd2,) = tdots((lam, d_s))
        dx, dy, dz, ds_sc, dz_sc, quality = newton(d_s, ltd2)
        ds_ds, dz_dz, l_ds, l_dz = tdots(
            (ds_sc, ds_sc), (dz_sc, dz_sc), (lam, ds_sc), (lam, dz_sc))
        alpha = jnp.minimum(1.0, cfg.step_frac * jnp.minimum(
            max_step(lam, ds_sc, ltl, ds_ds, l_ds),
            max_step(lam, dz_sc, ltl, dz_dz, l_dz)))

        # ---- Gondzio centrality correctors (config.py / ipm/driver.py in
        # head/tail form): each costs ONE unrefined back-solve on the
        # replicated factor plus a few tail reductions, while every saved
        # iteration avoids a full sharded Gram — the dominant cost here.
        # Replication: the clip factors derive from gathered tail dots, so
        # the head/orth deltas are replicated and the tail delta is a
        # replicated scalar times the local tail shard.
        for _ in range(cfg.gondzio_correctors or 0):
            mu_t = sigma * mu
            lo_b, hi_b = 0.1 * mu_t, 10.0 * mu_t
            a_hat = jnp.minimum(alpha / cfg.step_frac + 0.1, 1.0)
            v_s = axpy(lam, a_hat, ds_sc)
            v_z = axpy(lam, a_hat, dz_sc)
            (vs_vz,) = tdots((v_s, v_z))
            vprod = jprod(v_s, v_z, vs_vz)
            (vp_tt,) = tdots((vprod, vprod))
            # spectral clip delta, f32-grade (heuristic target; exactly
            # zero on in-band blocks — see cones.ops.eig_clip_delta)
            n1 = jnp.sqrt(jnp.maximum(vp_tt.hi, 0.0))        # (N,)
            lp = vprod.head.hi + n1
            lm = vprod.head.hi - n1
            dp = jnp.clip(lp, lo_b, hi_b) - lp
            dm = jnp.clip(lm, lo_b, hi_b) - lm
            fcl = 0.5 * (dp - dm) / jnp.where(n1 > 0, n1, 1.0)
            vo = vprod.orth.hi
            t = HV(ddm.from_f32(jnp.clip(vo, lo_b, hi_b) - vo),
                   ddm.from_f32(0.5 * (dp + dm)),
                   ddm.from_f32(vprod.tail.hi * fcl[:, None]))
            tn = vneg(t)
            (l_tn,) = tdots((lam, tn))
            dtil_c = jdiv(lam, tn, ltl, l_tn)
            dxc, dyc, dzc = kkt_solve_once(
                f, ddm.from_f32(jnp.zeros_like(c.hi)),
                ddm.from_f32(jnp.zeros_like(b.hi)),
                apply_W(sc, dtil_c))
            dz_sc_c = apply_W(sc, dzc)
            ds_sc_c = vneg(vadd(dtil_c, dz_sc_c))
            c_ds = vadd(ds_sc, ds_sc_c)
            c_dz = vadd(dz_sc, dz_sc_c)
            cs_cs, cz_cz, l_cs, l_cz = tdots(
                (c_ds, c_ds), (c_dz, c_dz), (lam, c_ds), (lam, c_dz))
            alpha_c = jnp.minimum(1.0, cfg.step_frac * jnp.minimum(
                max_step(lam, c_ds, ltl, cs_cs, l_cs),
                max_step(lam, c_dz, ltl, cz_cz, l_cz)))
            accept = alpha_c >= alpha + 0.01
            dx = ddm.where(accept, ddm.add(dx, dxc), dx)
            dy = ddm.where(accept, ddm.add(dy, dyc), dy)
            dz = hwhere(accept, vadd(dz, dzc), dz)
            ds_sc = hwhere(accept, c_ds, ds_sc)
            dz_sc = hwhere(accept, c_dz, dz_sc)
            alpha = jnp.where(accept, alpha_c, alpha)

        ds = apply_W(sc, ds_sc)

        step_finite = (
            jnp.isfinite(alpha) & (alpha > 0)
            & jnp.isfinite(jnp.sum(dx.hi * dx.hi))
            & jnp.isfinite(vdot(ds, ds).hi)
            & jnp.isfinite(vdot(dz, dz).hi))
        stalled = quality > cfg.solve_quality_tol
        numerr = ~step_finite | ~jnp.isfinite(gap) | stalled

        new_status = jnp.where(
            converged, Status.OPTIMAL,
            jnp.where(
                pinf, Status.PRIMAL_INFEASIBLE,
                jnp.where(
                    dinf, Status.DUAL_INFEASIBLE,
                    jnp.where(numerr, Status.NUMERICAL_ERROR,
                              Status.RUNNING)))).astype(jnp.int32)
        done_now = new_status != Status.RUNNING
        freeze = st.done | done_now

        if cfg.verbose:
            jax.debug.print(
                "{k:3d} pcost={pc:+.6e} gap={g:.3e} pres={pr:.3e} "
                "dres={dr:.3e} step={a:.3f} kktres={q:.1e}",
                k=st.k, pc=pcost, g=gap, pr=pres, dr=dres, a=alpha,
                q=quality)

        def upd(old: DD, d: DD) -> DD:
            return ddm.where(freeze, old, ddm.add(old, ddm.mul_f32(d, alpha)))

        hist = st.hist
        if cfg.collect_history:
            row = jnp.stack([pcost, dcost, gap, pres, dres,
                             jnp.where(freeze, 0.0, alpha)])
            hist = jnp.where(st.done, hist, hist.at[st.k].set(row))

        return St(
            x=upd(x, dx), y=upd(y, dy),
            s=_hmap(upd, s, ds), z=_hmap(upd, z, dz),
            k=jnp.where(freeze, st.k, st.k + 1),
            status=jnp.where(st.done, st.status, new_status),
            done=freeze,
            best_merit=best_merit, bx=bx, by=by, bs=bs, bz_=bz_,
            hist=hist)

    st = lax.while_loop(lambda st: (~st.done) & (st.k < cfg.max_iter),
                        body, st0)
    status = jnp.where(st.done, st.status, Status.MAX_ITERATIONS).astype(
        jnp.int32)

    # ---- relaxed exit pass (driver parity): best-iterate restore +
    # "optimal, inaccurate" acceptance + relaxed certificates ------------
    restore = (status == Status.NUMERICAL_ERROR) | (
        status == Status.MAX_ITERATIONS)
    rxf, ryf, rzf = residuals(st.x, st.y, st.s, st.z)
    pinf_f, dinf_f = certificates(st.x, st.y, st.s, st.z, rxf, ryf, rzf,
                                  cfg.feastol_inacc)
    pinf_exit = restore & pinf_f
    dinf_exit = restore & dinf_f

    x = ddm.where(restore, st.bx, st.x)
    y = ddm.where(restore, st.by, st.y)
    s = hwhere(restore, st.bs, st.s)
    z = hwhere(restore, st.bz_, st.z)

    rx, ry, rz = residuals(x, y, s, z)
    gap, pcost, dcost, relgap, pres, dres = metrics(x, y, s, z, rx, ry, rz)
    inacc_ok = (
        (pres <= cfg.feastol_inacc) & (dres <= cfg.feastol_inacc)
        & ((gap <= cfg.abstol_inacc) | (relgap <= cfg.reltol_inacc)))
    cert = ~inacc_ok & (pinf_exit | dinf_exit)
    x = ddm.where(cert, st.x, x)
    y = ddm.where(cert, st.y, y)
    s = hwhere(cert, st.s, s)
    z = hwhere(cert, st.z, z)
    status = jnp.where(
        restore & inacc_ok, Status.OPTIMAL,
        jnp.where(
            pinf_exit & ~inacc_ok, Status.PRIMAL_INFEASIBLE,
            jnp.where(dinf_exit & ~inacc_ok & ~pinf_exit,
                      Status.DUAL_INFEASIBLE, status))).astype(jnp.int32)
    inaccurate = restore & inacc_ok

    stats = jnp.stack([pcost, dcost, gap, relgap, pres, dres,
                       inaccurate.astype(jnp.float32)])
    if jax.config.jax_enable_x64:
        stats = stats.astype(jnp.float64)

    def out_hv(u: HV):
        return (u.orth.astype_f64(), u.head.astype_f64(),
                u.tail.astype_f64())

    so, sh, stl = out_hv(s)
    zo, zh, ztl = out_hv(z)
    return (x.astype_f64(), y.astype_f64(), so, sh, stl, zo, zh, ztl,
            status, st.k, stats, st.hist)


@functools.lru_cache(maxsize=32)
def _compiled(cfg: SolverConfig, mesh: Mesh, axis: str, n_soc: int, p: int):
    ndev = int(mesh.devices.size)
    fn = functools.partial(_core, cfg, axis, ndev, n_soc, p)
    sh = P(axis)
    sh2 = P(None, axis)
    sh3 = P(None, axis, None)
    rp = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rp, sh, rp, sh3, sh, rp, sh2, rp, rp),
        out_specs=(rp, rp, sh, rp, sh2, sh, rp, sh2, rp, rp, rp, rp),
        check_vma=ndev > 1,
    )
    return jax.jit(mapped)


def prepare_huge(
    c: np.ndarray,            # (n,)
    G: np.ndarray,            # (m, n): orthant rows, then SOC blocks in order
    h: np.ndarray,            # (m,)
    l: int,
    qs: tuple[int, ...],
    A: Optional[np.ndarray] = None,   # (p, n) coupling equalities
    b: Optional[np.ndarray] = None,
    mesh: Optional[Mesh] = None,
    config: SolverConfig = DEFAULT_CONFIG,
):
    """Device-resident preparation for the huge-cone solve: pads/splits the
    problem into the head/tail layout, places it on `mesh` ONCE, and
    returns `(fn, dev_args, assemble)` where `fn(*dev_args)` runs the
    sharded dd IPM and `assemble(out)` builds the host result tuple.
    Mirrors `socp_tpu.prepare_batch` — repeat solves (bench reps, warm
    sweeps) reuse the upload and the compiled executable instead of
    re-shipping the (m, n)-sized G through the host link per call.
    """
    import dataclasses

    from socp_tpu.parallel.mesh import block_mesh

    if config.gondzio_correctors is None:
        # same auto rule as api._resolve_pallas: every saved iteration
        # avoids a full sharded Gram on TPU; CPU stays corrector-free
        config = dataclasses.replace(
            config,
            gondzio_correctors=1 if jax.default_backend() == "tpu" else 0,
        )

    mesh = mesh or block_mesh()
    (axis,) = mesh.axis_names
    ndev = int(mesh.devices.size)
    m, n = G.shape
    n_soc = len(qs)
    assert n_soc >= 1, "need at least one SOC block"
    assert l + sum(qs) == m, f"l + sum(qs) = {l + sum(qs)} != m = {m}"
    assert all(q >= 1 for q in qs)
    p = 0 if A is None else np.shape(A)[0]
    A_h = np.zeros((0, n)) if A is None else np.asarray(A, np.float64)
    b_h = np.zeros((0,)) if b is None else np.asarray(b, np.float64)

    def padded(k):
        return max(-(-k // ndev) * ndev, ndev) if ndev > 1 else max(k, 1)

    l_pad = padded(l) if l else 0
    t_max = padded(max(q - 1 for q in qs))
    G_o = np.zeros((l_pad, n))
    G_o[:l] = G[:l]
    h_o = np.zeros(l_pad)
    # padding orthant rows with h=1 > 0 keeps them strictly feasible
    h_o[:l] = h[:l]
    h_o[l:] = 1.0
    G_H = np.zeros((n_soc, n))
    h_H = np.zeros(n_soc)
    G_t = np.zeros((n_soc, t_max, n))
    h_t = np.zeros((n_soc, t_max))
    off = l
    for i, q in enumerate(qs):
        G_H[i] = G[off]
        h_H[i] = h[off]
        G_t[i, : q - 1] = G[off + 1 : off + q]
        h_t[i, : q - 1] = h[off + 1 : off + q]
        off += q

    def put(a, spec):
        a = jnp.asarray(a, jnp.float64)
        return jax.device_put(a, NamedSharding(mesh, spec))

    args = (
        put(c, P()), put(G_o, P(axis)), put(G_H, P()),
        put(G_t, P(None, axis)), put(h_o, P(axis)), put(h_H, P()),
        put(h_t, P(None, axis)), put(A_h, P()), put(b_h, P()),
    )
    fn = _compiled(config, mesh, axis, n_soc, p)

    def gather(o, hd, tl):
        o = np.asarray(o, np.float64)[:l]
        hd = np.asarray(hd, np.float64)
        tl = np.asarray(tl, np.float64)
        pieces = [o]
        for i, q in enumerate(qs):
            pieces.append(hd[i : i + 1])
            pieces.append(tl[i, : q - 1])
        return np.concatenate(pieces)

    def assemble(raw):
        (x, y, s_o, s_H, s_t, z_o, z_H, z_t, status, k, stats, hist) = raw
        out = (
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            gather(s_o, s_H, s_t), gather(z_o, z_H, z_t),
            Status(int(status)), int(k), np.asarray(stats, np.float64),
        )
        if config.collect_history:
            out = out + (np.asarray(hist, np.float64)[: int(k)],)
        return out

    return fn, args, assemble


def solve_huge(
    c: np.ndarray,
    G: np.ndarray,
    h: np.ndarray,
    l: int,
    qs: tuple[int, ...],
    A: Optional[np.ndarray] = None,
    b: Optional[np.ndarray] = None,
    mesh: Optional[Mesh] = None,
    config: SolverConfig = DEFAULT_CONFIG,
):
    """Solve min c'x s.t. Ax = b, Gx + s = h, s in R+^l x Q^q1 x ... with
    the cone vector sharded across `mesh` (sum(qs) may vastly exceed one
    device's comfort); dd32-native throughout.

    Returns (x, y, s, z, status, iterations, stats) with stats in the
    driver-parity layout [pcost, dcost, gap, relgap, pres, dres,
    inaccurate_flag]; s, z are reassembled full-length on host.  With
    config.collect_history the per-iteration table is appended.
    """
    fn, args, assemble = prepare_huge(c, G, h, l, qs, A=A, b=b, mesh=mesh,
                                      config=config)
    return assemble(fn(*args))


def solve_huge_soc(
    c: np.ndarray,            # (n,)
    G: np.ndarray,            # (l + q, n): orthant rows then ONE SOC block
    h: np.ndarray,            # (l + q,)
    l: int,
    mesh: Optional[Mesh] = None,
    config: SolverConfig = DEFAULT_CONFIG,
):
    """Single-SOC convenience wrapper (round-2 signature).

    Returns (x, s, z, status, iterations, stats=[pcost, gap, pres, dres])
    — the historical 4-stat layout; use solve_huge for the full
    driver-parity surface."""
    q = G.shape[0] - l
    out = solve_huge(c, G, h, l, (q,), mesh=mesh, config=config)
    x, y, s, z, status, k, stats = out[:7]
    return (x, s, z, status, k,
            np.asarray([stats[0], stats[2], stats[4], stats[5]]))
