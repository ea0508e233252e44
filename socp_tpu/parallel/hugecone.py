"""One HUGE cone sharded across the mesh (SURVEY.md section 5,
long-context row, plan item (a)).

The solver analog of sequence parallelism: a single SOCP whose constraint
vector is too long for one device's comfort —

    minimize c'x   s.t.   G x + s = h,   s in R+^l x Q^q

with l + q = m huge and n modest.  The m-dimensional rows of G and every
m-vector (s, z, h, residuals, directions) are sharded over a mesh axis;
x and the condensed n x n system stay replicated.  Per SURVEY the cone
kernels become local elementwise work + ONE scalar psum each:

  * SOC state is (head, tail): the head coordinate u0 is REPLICATED, the
    (q-1)-tail is sharded — every Jordan-algebra quantity (det, arrow
    product, NT point, max-step quadratic) is then head-scalar arithmetic
    plus a psum-reduced tail dot;
  * the condensed KKT is the tall-skinny Gram H = (W^-1 G)'(W^-1 G):
    each shard Grams its own rows, ONE (n, n) psum reduces them, chol(H)
    runs replicated — no device ever materializes full G'G traffic.

Scope: p = 0 (no equality rows) and a single SOC (+ orthant); the block
and batched paths cover the other regimes.  f64 carries (CPU-mesh grade);
cites ipm/driver.py for the algorithm it mirrors step-for-step.
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
from socp_tpu.solution import Status


class HVec(NamedTuple):
    """A sharded member of R^l x R^q: orthant shard, replicated SOC head,
    sharded SOC tail."""

    orth: jax.Array    # (l_loc,)
    head: jax.Array    # () replicated
    tail: jax.Array    # (t_loc,)  (q - 1 total)


class HScaling(NamedTuple):
    w_orth: jax.Array                  # (l_loc,)
    eta: jax.Array                     # ()
    v: HVec                            # NT point as (head, tail); orth unused
    lam: "HVec"


def _core(cfg: SolverConfig, axis: str, ndev: int, c, G_o, G_h, G_t,
          h_o, h_h, h_t):
    """SPMD body under shard_map.  G_o: (l_loc, n) orthant rows; G_h: (1, n)
    the SOC head row (replicated); G_t: (t_loc, n) SOC tail rows."""
    dtype = c.dtype
    n = c.shape[0]

    def psum(v):
        return lax.psum(v, axis) if ndev > 1 else v

    def pmin(v):
        return lax.pmin(v, axis) if ndev > 1 else v

    h = HVec(h_o, h_h[0], h_t)
    l_tot = psum(jnp.asarray(float(h_o.shape[0]), dtype))
    nu = l_tot + 1.0                                   # degree: l + one SOC

    # ---- HVec algebra ---------------------------------------------------
    def vdot(u: HVec, v: HVec):
        return psum(u.orth @ v.orth + u.tail @ v.tail) + u.head * v.head

    def vnorm2(u: HVec):
        return vdot(u, u)

    def vadd(u, v):
        return HVec(u.orth + v.orth, u.head + v.head, u.tail + v.tail)

    def vsub(u, v):
        return HVec(u.orth - v.orth, u.head - v.head, u.tail - v.tail)

    def vscale(u, a):
        return HVec(a * u.orth, a * u.head, a * u.tail)

    def axpy(u, a, d):
        return vadd(u, vscale(d, a))

    e = HVec(jnp.ones_like(h_o), jnp.ones((), dtype), jnp.zeros_like(h_t))

    def soc_det(u: HVec):
        return u.head ** 2 - psum(u.tail @ u.tail)

    def soc_dot_tail(u: HVec, v: HVec):
        return psum(u.tail @ v.tail)

    def jprod(u: HVec, v: HVec) -> HVec:
        return HVec(
            u.orth * v.orth,
            u.head * v.head + soc_dot_tail(u, v),
            u.head * v.tail + v.head * u.tail,
        )

    def jdiv(lam: HVec, d: HVec) -> HVec:
        det = soc_det(lam)
        l1d1 = soc_dot_tail(lam, d)
        u0 = (lam.head * d.head - l1d1) / det
        return HVec(
            d.orth / lam.orth,
            u0,
            (d.tail - u0 * lam.tail) / lam.head,
        )

    def lambda_min(u: HVec):
        mo = jnp.min(u.orth) if u.orth.shape[0] else jnp.asarray(jnp.inf, dtype)
        n1 = jnp.sqrt(jnp.maximum(psum(u.tail @ u.tail), 0.0))
        return jnp.minimum(pmin(mo), u.head - n1)

    def max_step(u: HVec, du: HVec):
        inf = jnp.asarray(jnp.inf, dtype)
        cand_o = jnp.where(du.orth < 0, -u.orth / du.orth, inf)
        a_o = pmin(jnp.min(cand_o) if cand_o.shape[0] else inf)
        a = soc_det(du)
        b = 2.0 * (u.head * du.head - soc_dot_tail(u, du))
        cq = soc_det(u)
        disc = b * b - 4.0 * a * cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        denom = -b + sq
        valid = ((a < 0) | ((b < 0) & (disc >= 0))) & (denom > 0)
        a_s = jnp.where(valid, 2.0 * cq / jnp.where(denom > 0, denom, 1.0), inf)
        return jnp.minimum(a_o, a_s)

    # ---- NT scaling (SURVEY Appendix A, head/tail form) ----------------
    def nt_scale(s: HVec, z: HVec) -> HScaling:
        w_orth = jnp.sqrt(s.orth / z.orth)
        dets = soc_det(s)
        detz = soc_det(z)
        rs, rz_ = jnp.sqrt(dets), jnp.sqrt(detz)
        sbar = HVec(s.orth, s.head / rs, s.tail / rs)
        zbar = HVec(z.orth, z.head / rz_, z.tail / rz_)
        # gamma^2 = (1 + zbar'sbar)/2 with the SOC inner product
        gamma = jnp.sqrt(
            (1.0 + sbar.head * zbar.head + soc_dot_tail(sbar, zbar)) / 2.0
        )
        # wbar = (sbar + J zbar) / (2 gamma)
        wb_head = (sbar.head + zbar.head) / (2.0 * gamma)
        wb_tail = (sbar.tail - zbar.tail) / (2.0 * gamma)
        vden = jnp.sqrt(2.0 * (1.0 + wb_head))
        v = HVec(w_orth, (wb_head + 1.0) / vden, wb_tail / vden)
        eta = (dets / detz) ** 0.25
        # lam = W z = eta (2 v (v'z) - J z)
        vz = v.head * z.head + soc_dot_tail(v, z)
        lam = HVec(
            jnp.sqrt(s.orth * z.orth),
            eta * (2.0 * v.head * vz - z.head),
            eta * (2.0 * v.tail * vz + z.tail),
        )
        return HScaling(w_orth=w_orth, eta=eta, v=v, lam=lam)

    def apply_W(sc: HScaling, u: HVec) -> HVec:
        vu = sc.v.head * u.head + soc_dot_tail(sc.v, u)
        return HVec(
            sc.w_orth * u.orth,
            sc.eta * (2.0 * sc.v.head * vu - u.head),
            sc.eta * (2.0 * sc.v.tail * vu + u.tail),
        )

    def apply_Winv(sc: HScaling, u: HVec) -> HVec:
        # W^-1 = eta^-1 P(Jv):  (Jv)'u = v0 u0 - v1'u1
        jvu = sc.v.head * u.head - soc_dot_tail(sc.v, u)
        return HVec(
            u.orth / sc.w_orth,
            (2.0 * sc.v.head * jvu - u.head) / sc.eta,
            (-2.0 * sc.v.tail * jvu + u.tail) / sc.eta,
        )

    # ---- KKT: tall-skinny Gram, replicated chol ------------------------
    def scale_rows_Winv(sc: HScaling):
        """(Ghat_o, Ghat_h, Ghat_t) = W^-1 G rows, shard-local + one psum.

        SOC rows: W^-1 [g0; G1] rowwise needs t = (Jv)'G = v0 g0 - V1'G1,
        an (n,)-psum across tail shards."""
        t = sc.v.head * G_h[0] - psum(sc.v.tail @ G_t)          # (n,)
        Gh_o = G_o / sc.w_orth[:, None]
        Gh_h = (2.0 * sc.v.head * t - G_h[0]) / sc.eta
        Gh_t = (-2.0 * sc.v.tail[:, None] * t[None, :] + G_t) / sc.eta
        return Gh_o, Gh_h, Gh_t

    class Factored(NamedTuple):
        R: jax.Array          # replicated chol of H + delta
        Gh_o: jax.Array
        Gh_h: jax.Array
        Gh_t: jax.Array
        scaling: HScaling

    def factor(sc: HScaling) -> Factored:
        Gh_o, Gh_h, Gh_t = scale_rows_Winv(sc)
        H = psum(Gh_o.T @ Gh_o + Gh_t.T @ Gh_t) + jnp.outer(Gh_h, Gh_h)
        if cfg.delta_reg:
            # scale-free: delta relative to each row's own diagonal
            dg = jnp.maximum(jnp.diagonal(H), 1e-30)
            H = H + (cfg.delta_reg * dg) * jnp.eye(n, dtype=dtype)
        R = jnp.linalg.cholesky(H)
        return Factored(R=R, Gh_o=Gh_o, Gh_h=Gh_h, Gh_t=Gh_t, scaling=sc)

    def Ghat_mv(f: Factored, x):
        return HVec(f.Gh_o @ x, f.Gh_h @ x, f.Gh_t @ x)

    def GhatT_mv(f: Factored, u: HVec):
        return psum(f.Gh_o.T @ u.orth + f.Gh_t.T @ u.tail) + f.Gh_h * u.head

    def G_mv(x):
        return HVec(G_o @ x, G_h[0] @ x, G_t @ x)

    def GT_mv(u: HVec):
        return psum(G_o.T @ u.orth + G_t.T @ u.tail) + G_h[0] * u.head

    def chol_solve(R, v):
        y = lax.linalg.triangular_solve(R, v[:, None], left_side=True,
                                        lower=True)
        return lax.linalg.triangular_solve(
            R, y, left_side=True, lower=True, transpose_a=True
        )[:, 0]

    def kkt_solve(f: Factored, bx, bz: HVec):
        """Condensed: (H) dx = bx + Ghat' W^-1 bz;  dz = W^-1(Ghat dx - bhz)."""
        bhz = apply_Winv(f.scaling, bz)
        dx = chol_solve(f.R, bx + GhatT_mv(f, bhz))
        dz = apply_Winv(f.scaling, vsub(Ghat_mv(f, dx), bhz))
        for _ in range(cfg.refine_steps):
            WW = apply_W(f.scaling, apply_W(f.scaling, dz))
            rx = bx - (GT_mv(dz))
            rz = vsub(bz, vsub(G_mv(dx), WW))
            bh2 = apply_Winv(f.scaling, rz)
            ex = chol_solve(f.R, rx + GhatT_mv(f, bh2))
            ez = apply_Winv(f.scaling, vsub(Ghat_mv(f, ex), bh2))
            dx = dx + ex
            dz = vadd(dz, ez)
        return dx, dz

    norm_h = jnp.maximum(1.0, jnp.sqrt(vnorm2(h)))
    norm_c = jnp.maximum(1.0, jnp.linalg.norm(c))

    def residuals(x, s: HVec, z: HVec):
        rx = GT_mv(z) + c
        rz = vsub(vadd(G_mv(x), s), h)
        return rx, rz

    # ---- init ----------------------------------------------------------
    sc0 = HScaling(
        w_orth=jnp.ones_like(h_o), eta=jnp.ones((), dtype),
        v=HVec(jnp.ones_like(h_o), jnp.ones((), dtype), jnp.zeros_like(h_t)),
        lam=e,
    )
    f0 = factor(sc0)
    zero_n = jnp.zeros((n,), dtype)
    zero_m = HVec(jnp.zeros_like(h_o), jnp.zeros((), dtype),
                  jnp.zeros_like(h_t))
    x0, z0 = kkt_solve(f0, zero_n, h)
    shat = vscale(z0, -1.0)
    ap = -lambda_min(shat)
    s0 = jax.tree.map(
        lambda a, b: jnp.where(ap < 0, a, b), shat, axpy(shat, 1.0 + ap, e)
    )
    _, zhat = kkt_solve(f0, -c, zero_m)
    ad = -lambda_min(zhat)
    z0 = jax.tree.map(
        lambda a, b: jnp.where(ad < 0, a, b), zhat, axpy(zhat, 1.0 + ad, e)
    )

    class St(NamedTuple):
        x: jax.Array
        s: HVec
        z: HVec
        k: jax.Array
        status: jax.Array
        done: jax.Array

    st0 = St(x=x0, s=s0, z=z0, k=jnp.zeros((), jnp.int32),
             status=jnp.full((), Status.RUNNING, jnp.int32),
             done=jnp.zeros((), bool))

    def body(st: St) -> St:
        x, s, z = st.x, st.s, st.z
        rx, rz = residuals(x, s, z)
        gap = vdot(s, z)
        mu = gap / nu
        pcost = c @ x
        dcost = pcost + vdot(z, rz) - gap
        relgap = jnp.where(
            pcost < 0, gap / -pcost,
            jnp.where(dcost > 0, gap / dcost, jnp.inf),
        )
        pres = jnp.sqrt(vnorm2(rz)) / norm_h
        dres = jnp.linalg.norm(rx) / norm_c
        converged = (
            (pres <= cfg.feastol) & (dres <= cfg.feastol)
            & ((gap <= cfg.abstol) | (relgap <= cfg.reltol))
        )

        # Farkas certificates off the residuals (parity with ipm/driver.py;
        # p = 0 here): G'z = rx - c, Gx + s = rz + h.  Strict feastol, like
        # the other drivers' in-loop tests — the relaxed threshold belongs
        # only to a stall-exit pass, which this solver doesn't have.
        hz = vdot(h, z)
        pinf = (hz < 0) & (
            jnp.linalg.norm(rx - c) <= cfg.feastol * -hz
        )
        cx = pcost
        gx_s = vadd(rz, h)
        dinf = (cx < 0) & (
            jnp.sqrt(vnorm2(gx_s)) <= cfg.feastol * -cx
        )

        sc = nt_scale(s, z)
        f = factor(sc)
        lam = sc.lam

        def newton(d_s: HVec):
            dtil = jdiv(lam, d_s)
            dx, dz = kkt_solve(f, -rx, vadd(vscale(rz, -1.0),
                                            apply_W(sc, dtil)))
            dz_sc = apply_W(sc, dz)
            ds_sc = vscale(vadd(dtil, dz_sc), -1.0)
            return dx, dz, ds_sc, dz_sc

        lam2 = jprod(lam, lam)
        _, dz_a, ds_sc_a, dz_sc_a = newton(lam2)
        alpha_a = jnp.minimum(
            1.0, jnp.minimum(max_step(lam, ds_sc_a), max_step(lam, dz_sc_a))
        )
        gap_a = vdot(axpy(lam, alpha_a, ds_sc_a), axpy(lam, alpha_a, dz_sc_a))
        sigma = jnp.clip(gap_a / gap, 0.0, 1.0) ** 3

        d_s = vsub(vadd(lam2, jprod(ds_sc_a, dz_sc_a)), vscale(e, sigma * mu))
        dx, dz, ds_sc, dz_sc = newton(d_s)
        ds = apply_W(sc, ds_sc)
        alpha = jnp.minimum(
            1.0, cfg.step_frac * jnp.minimum(
                max_step(lam, ds_sc), max_step(lam, dz_sc)
            )
        )
        finite = (
            jnp.isfinite(alpha) & (alpha > 0)
            & jnp.isfinite(jnp.sum(dx * dx)) & jnp.isfinite(vnorm2(ds))
        )
        new_status = jnp.where(
            converged, Status.OPTIMAL,
            jnp.where(
                pinf, Status.PRIMAL_INFEASIBLE,
                jnp.where(
                    dinf, Status.DUAL_INFEASIBLE,
                    jnp.where(finite, Status.RUNNING,
                              Status.NUMERICAL_ERROR),
                ),
            ),
        ).astype(jnp.int32)
        done_now = new_status != Status.RUNNING
        freeze = st.done | done_now

        def upd_h(old: HVec, d: HVec) -> HVec:
            return jax.tree.map(
                lambda o, dd: jnp.where(freeze, o, o + alpha * dd), old, d
            )

        return St(
            x=jnp.where(freeze, x, x + alpha * dx),
            s=upd_h(s, ds), z=upd_h(z, dz),
            k=jnp.where(freeze, st.k, st.k + 1),
            status=jnp.where(st.done, st.status, new_status),
            done=freeze,
        )

    st = lax.while_loop(lambda st: (~st.done) & (st.k < cfg.max_iter),
                        body, st0)
    status = jnp.where(st.done, st.status, Status.MAX_ITERATIONS).astype(
        jnp.int32
    )
    rx, rz = residuals(st.x, st.s, st.z)
    gap = vdot(st.s, st.z)
    pcost = c @ st.x
    pres = jnp.sqrt(vnorm2(rz)) / norm_h
    dres = jnp.linalg.norm(rx) / norm_c
    stats = jnp.stack([pcost, gap, pres, dres])
    return (st.x, st.s.orth, st.s.head[None], st.s.tail,
            st.z.orth, st.z.head[None], st.z.tail, status, st.k, stats)


@functools.lru_cache(maxsize=32)
def _compiled(cfg: SolverConfig, mesh: Mesh, axis: str):
    ndev = int(mesh.devices.size)
    fn = functools.partial(_core, cfg, axis, ndev)
    sh = P(axis)
    rp = P()
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(rp, sh, rp, sh, sh, rp, sh),
        out_specs=(rp, sh, rp, sh, sh, rp, sh, rp, rp, rp),
        check_vma=ndev > 1,
    )
    return jax.jit(mapped)


def solve_huge_soc(
    c: np.ndarray,            # (n,)
    G: np.ndarray,            # (l + q, n): orthant rows then ONE SOC block
    h: np.ndarray,            # (l + q,)
    l: int,
    mesh: Optional[Mesh] = None,
    config: SolverConfig = DEFAULT_CONFIG,
):
    """Solve min c'x s.t. Gx + s = h, s in R+^l x Q^q with the cone vector
    sharded across `mesh` (q may vastly exceed one device's comfort).

    Returns (x, s, z, status, iterations, stats=[pcost, gap, pres, dres]);
    s, z are reassembled full-length on host."""
    from socp_tpu.api import default_dtype
    from socp_tpu.parallel.mesh import block_mesh

    mesh = mesh or block_mesh()
    (axis,) = mesh.axis_names
    ndev = int(mesh.devices.size)
    dtype = default_dtype()
    m, n = G.shape
    q = m - l
    assert q >= 1, "need one SOC block"
    t = q - 1                                   # tail length

    def padded(k):
        return -(-k // ndev) * ndev if ndev > 1 else k

    l_pad, t_pad = padded(l), padded(t)
    G_o = np.zeros((l_pad, n))
    G_o[:l] = G[:l]
    h_o = np.zeros(l_pad)
    # padding orthant rows with h=1 > 0 keeps them strictly feasible
    h_o[:l] = h[:l]
    h_o[l:] = 1.0
    G_t = np.zeros((t_pad, n))
    G_t[:t] = G[l + 1:]
    h_t = np.zeros(t_pad)
    h_t[:t] = h[l + 1:]

    def put(a, spec):
        a = jnp.asarray(a, dtype)
        return jax.device_put(a, NamedSharding(mesh, spec))

    args = (
        put(c, P()), put(G_o, P(axis)), put(G[l:l + 1], P()),
        put(G_t, P(axis)), put(h_o, P(axis)), put(h[l:l + 1], P()),
        put(h_t, P(axis)),
    )
    fn = _compiled(config, mesh, axis)
    (x, s_o, s_h, s_t, z_o, z_h, z_t, status, k, stats) = fn(*args)

    def gather(o, hd, tl):
        o = np.asarray(o, np.float64)[:l]
        return np.concatenate([o, np.asarray(hd, np.float64),
                               np.asarray(tl, np.float64)[:t]])

    return (
        np.asarray(x, np.float64), gather(s_o, s_h, s_t),
        gather(z_o, z_h, z_t), Status(int(status)), int(k),
        np.asarray(stats, np.float64),
    )
