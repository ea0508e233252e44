"""dd32-native IPM driver: zero f64 anywhere in the hot loop.

Mirrors ipm/driver.py step-for-step (same algorithm, same status logic,
same best-iterate/stall handling) with the carries, cone kernels, and KKT
pipeline all in double-word f32:

  * constant problem data (G, A, P and their transposes) is Ozaki-sliced
    ONCE outside the while_loop; every residual/refinement matvec is a
    handful of bf16 MXU passes;
  * per-iteration: dd NT scaling -> Ozaki Gram -> dd Cholesky -> dd
    substitutions -> dd refinement;
  * scalar control flow (step lengths, tolerances, status) reads hi words
    (f32) — cancellation-sensitive *vectors* are dd, scalars derived from
    them don't need more than f32.

Measured motivation: XLA-emulated f64 on TPU costs ~50-100x f32 even for
elementwise ops; the f64-carry driver spends >95% of its iteration time on
emulation (see kkt/dd_dense.py header).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from socp_tpu.cones import dd_ops
from socp_tpu.cones.layout import ConeLayout
from socp_tpu.config import SolverConfig
from socp_tpu.kkt import dd_dense
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD
from socp_tpu.ops.ozaki import preslice
from socp_tpu.solution import Status


class DDIPMState(NamedTuple):
    x: DD
    y: DD
    s: DD
    z: DD
    k: jax.Array
    status: jax.Array
    done: jax.Array
    best_merit: jax.Array
    bx: DD
    by: DD
    bs: DD
    bz_: DD
    hist: jax.Array      # (max_iter, 6) f32 when cfg.collect_history


def _norm(v: DD) -> jax.Array:
    if v.hi.shape[0] == 0:
        return jnp.float32(0.0)
    return jnp.sqrt(jnp.sum(v.hi * v.hi))


def _axpy(x: DD, alpha, d: DD) -> DD:
    return ddm.add(x, ddm.mul_f32(d, alpha))


@partial(jax.jit, static_argnames=("layout", "cfg", "has_P"))
def solve_core_dd(
    layout: ConeLayout,
    cfg: SolverConfig,
    c64: jax.Array,
    G64: jax.Array,
    h64: jax.Array,
    A64: jax.Array,
    b64: jax.Array,
    P64: jax.Array,
    has_P: bool = False,
    warm: tuple | None = None,
):
    """dd-native solve of one padded SOCP; f64/f32 inputs, f32 outputs.

    Returns (x, y, s, z, status, iterations, stats) with the same layout as
    driver.solve_core (arrays in f32).

    `warm`: optional (x, y, s, z) start (padded, f32/f64).  Skips the two
    W=I least-squares init solves; s and z are lifted along the cone
    identity until their smallest Jordan eigenvalue reaches
    cfg.warm_push x the iterate's own mean magnitude — a warm point ON
    the boundary destroys the NT scaling, and a converged point's s_i z_i
    products are maximally uncentered, so the lift trades a little
    restart mu for digestible centrality (a mu_w-derived margin is a
    measured dead end; see the init comment).
    """
    n = c64.shape[0]
    p = A64.shape[0]
    m = layout.m_pad
    nu = jnp.float32(float(layout.degree))
    e = dd_ops.identity(layout)

    to_dd = (
        ddm.from_f64
        if c64.dtype == jnp.float64
        else lambda a: ddm.from_f32(a.astype(jnp.float32))
    )
    c = to_dd(c64)
    G = to_dd(G64)
    h = to_dd(h64)
    A = to_dd(A64)
    b = to_dd(b64)
    P = to_dd(P64) if has_P else None

    # ---- constants sliced once (reused by every matvec in the loop)
    cm = dd_dense.ConstMats(
        A_s=preslice(A) if p else None,
        AT_s=preslice(A.T) if p else None,
        G_s=preslice(G),
        GT_s=preslice(G.T),
        P_s=preslice(P) if has_P else None,
    )
    # per-solve constant Grams: for few-SOC-block layouts the per-iteration
    # H assembly needs NO Ozaki pass over the full G (see dd_dense.ConstGram)
    cg = dd_dense.precompute_const_gram(layout, G)

    norm_b = jnp.maximum(1.0, _norm(b))
    norm_h = jnp.maximum(1.0, _norm(h))
    norm_c = jnp.maximum(1.0, _norm(c))

    aug_rho = cfg.aug_rho if p else 0.0
    if aug_rho:
        AtA = dd_dense._dd_mm(A.T, A)
        Paug = ddm.mul_f32(AtA, jnp.float32(aug_rho))
        if has_P:
            Paug = ddm.add(Paug, P)
    else:
        Paug = P

    def mv(sl, v):
        return dd_dense.sliced_matvec(sl, v)

    def residuals(x, y, s, z):
        Px = mv(cm.P_s, x) if has_P else None
        rx = ddm.add(mv(cm.GT_s, z), c)
        if p:
            rx = ddm.add(rx, mv(cm.AT_s, y))
        if has_P:
            rx = ddm.add(rx, Px)
        ry = ddm.sub(mv(cm.A_s, x), b) if p else b
        rz = ddm.sub(ddm.add(mv(cm.G_s, x), s), h)
        return rx, ry, rz, Px

    def metrics(x, y, s, z, rx, ry, rz, Px):
        gap = dd_ops.dd_dot(s, z, axis=0).hi
        pcost = dd_ops.dd_dot(c, x, axis=0).hi
        if has_P:
            pcost = pcost + 0.5 * dd_ops.dd_dot(x, Px, axis=0).hi
        dcost = (
            pcost
            + (dd_ops.dd_dot(y, ry, axis=0).hi if p else 0.0)
            + dd_ops.dd_dot(z, rz, axis=0).hi
            - gap
        )
        relgap = jnp.where(
            pcost < 0,
            gap / -pcost,
            jnp.where(dcost > 0, gap / dcost, jnp.inf),
        )
        pres = jnp.maximum(_norm(ry) / norm_b, _norm(rz) / norm_h)
        dres = _norm(rx) / norm_c
        return gap, pcost, dcost, relgap, pres, dres

    def refined(kkt, bx, by, bz, steps=None):
        return dd_dense.solve_refined_dd(
            layout, kkt, cm, A, bx, by, bz,
            refine_steps=cfg.refine_steps if steps is None else steps,
            aug_rho=aug_rho,
        )

    # ---- init: warm start (shifted user point) or W = I solves + shift
    if warm is not None:
        xw, yw, sw, zw = (to_dd(w) for w in warm)
        x0, y0 = xw, yw
        # magnitude-relative recentering (see ipm/driver.py): a converged
        # point is maximally uncentered; lift by warm_push x the iterate's
        # own mean magnitude, not by the (tiny) residual mu
        scale = 0.5 * (jnp.mean(jnp.abs(sw.hi)) + jnp.mean(jnp.abs(zw.hi)))
        margin = jnp.float32(cfg.warm_push) * (scale + 1e-8)

        def recenter(v: DD) -> DD:
            lift = jnp.maximum(margin - dd_ops.lambda_min(layout, v), 0.0)
            return _axpy(v, lift, e)

        s0 = recenter(sw)
        z0 = recenter(zw)
    else:
        sc0 = dd_ops.identity_scaling(layout)
        zero_n = ddm.from_f32(jnp.zeros((n,), jnp.float32))
        zero_p = ddm.from_f32(jnp.zeros((p,), jnp.float32))
        zero_m = ddm.from_f32(jnp.zeros((m,), jnp.float32))
        kkt0 = dd_dense.factor_dd(layout, sc0, Paug, A, G, cfg.delta_reg,
                                  pallas=bool(cfg.use_pallas),
                                  GT_s=cm.GT_s, G_s=cm.G_s,
                                  invert=bool(cfg.invert_factor), cg=cg)
        x0, _, z0, _ = refined(kkt0, zero_n, b, h)
        shat = z0.neg()
        ap = -dd_ops.lambda_min(layout, shat)
        s0 = ddm.where(ap < 0, shat, _axpy(shat, 1.0 + ap, e))
        _, y0, zhat, _ = refined(kkt0, c.neg(), zero_p, zero_m)
        ad = -dd_ops.lambda_min(layout, zhat)
        z0 = ddm.where(ad < 0, zhat, _axpy(zhat, 1.0 + ad, e))

    n_hist = cfg.max_iter if cfg.collect_history else 0
    st0 = DDIPMState(
        x=x0, y=y0, s=s0, z=z0,
        k=jnp.zeros((), jnp.int32),
        status=jnp.full((), Status.RUNNING, jnp.int32),
        done=jnp.zeros((), bool),
        best_merit=jnp.float32(jnp.inf),
        bx=x0, by=y0, bs=s0, bz_=z0,
        hist=jnp.zeros((n_hist, 6), jnp.float32),
    )

    def body(st: DDIPMState) -> DDIPMState:
        x, y, s, z = st.x, st.y, st.s, st.z
        rx, ry, rz, Px = residuals(x, y, s, z)
        gap, pcost, dcost, relgap, pres, dres = metrics(
            x, y, s, z, rx, ry, rz, Px
        )
        mu = gap / nu
        converged = (
            (pres <= cfg.feastol)
            & (dres <= cfg.feastol)
            & ((gap <= cfg.abstol) | (relgap <= cfg.reltol))
        )

        merit = jnp.maximum(jnp.maximum(pres, dres),
                            jnp.minimum(relgap, gap))
        better = (merit < st.best_merit) & ~st.done
        best_merit = jnp.where(better, merit, st.best_merit)
        bx = ddm.where(better, x, st.bx)
        by = ddm.where(better, y, st.by)
        bs = ddm.where(better, s, st.bs)
        bz_ = ddm.where(better, z, st.bz_)

        # Farkas certificates, read off the residuals (zero extra matvecs):
        # A'y + G'z = rx - c (- Px), Ax = ry + b, Gx + s = rz + h.
        hz_by = dd_ops.dd_dot(h, z, axis=0).hi + (
            dd_ops.dd_dot(y, b, axis=0).hi if p else 0.0
        )
        aty_gtz = ddm.sub(rx, c) if not has_P else ddm.sub(ddm.sub(rx, c), Px)
        pinf = (hz_by < 0) & (_norm(aty_gtz) <= cfg.feastol * -hz_by)
        cx = dd_ops.dd_dot(c, x, axis=0).hi
        dinf_res = jnp.maximum(
            _norm(ddm.add(ry, b)) if p else 0.0, _norm(ddm.add(rz, h))
        )
        if has_P:
            dinf_res = jnp.maximum(dinf_res, _norm(Px))
        dinf = (cx < 0) & (dinf_res <= cfg.feastol * -cx)

        # ---- hot block
        scaling = dd_ops.nt_scale(layout, s, z)
        kkt = dd_dense.factor_dd(layout, scaling, Paug, A, G, cfg.delta_reg,
                                 pallas=bool(cfg.use_pallas),
                                 GT_s=cm.GT_s, G_s=cm.G_s,
                                 invert=bool(cfg.invert_factor), cg=cg)
        lam = scaling.lam

        def newton(d_s, steps=None):
            dtil = dd_ops.jdiv(layout, lam, d_s)
            rhs_z = ddm.add(rz.neg(), dd_ops.apply_W(layout, scaling, dtil))
            dx, dy, dz, quality = refined(kkt, rx.neg(), ry.neg(), rhs_z,
                                          steps=steps)
            dz_sc = dd_ops.apply_W(layout, scaling, dz)
            ds_sc = ddm.add(dtil, dz_sc).neg()
            return dx, dy, dz, ds_sc, dz_sc, quality

        lam2 = dd_ops.jprod(layout, lam, lam)
        dx_a, dy_a, dz_a, ds_sc_a, dz_sc_a, _ = newton(
            lam2, steps=cfg.refine_affine
        )
        alpha_a = dd_ops.max_step_pair(layout, lam, ds_sc_a, dz_sc_a)
        alpha_a = jnp.minimum(1.0, alpha_a)
        gap_a = dd_ops.dd_dot(
            _axpy(lam, alpha_a, ds_sc_a), _axpy(lam, alpha_a, dz_sc_a),
            axis=0,
        ).hi
        sigma = jnp.clip(gap_a / gap, 0.0, 1.0) ** 3

        d_s = ddm.sub(
            ddm.add(lam2, dd_ops.jprod(layout, ds_sc_a, dz_sc_a)),
            ddm.mul_f32(e, sigma * mu),
        )
        dx, dy, dz, ds_sc, dz_sc, quality = newton(d_s)

        alpha = dd_ops.max_step_pair(layout, lam, ds_sc, dz_sc)
        alpha = jnp.minimum(1.0, cfg.step_frac * alpha)

        # ---- Gondzio multiple centrality correctors (config.py): push the
        # trial point's outlier Jordan products into [0.1, 10] x sigma*mu
        # with one extra unrefined back-solve each; accept per instance
        # only if the cone step lengthens by >= 0.01.
        for _ in range(cfg.gondzio_correctors or 0):
            zn = ddm.from_f32(jnp.zeros((n,), jnp.float32))
            zp = ddm.from_f32(jnp.zeros((p,), jnp.float32))
            mu_t = sigma * mu
            a_hat = jnp.minimum(alpha / cfg.step_frac + 0.1, 1.0)
            v_s = _axpy(lam, a_hat, ds_sc)
            v_z = _axpy(lam, a_hat, dz_sc)
            vprod = dd_ops.jprod(layout, v_s, v_z)
            t = dd_ops.eig_clip_delta(layout, vprod,
                                      0.1 * mu_t, 10.0 * mu_t)
            # corrector Newton: zero residual parts, target lam o (ds+dz)=t
            dtil_c = dd_ops.jdiv(layout, lam, t.neg())
            rhs_zc = dd_ops.apply_W(layout, scaling, dtil_c)
            dxc, dyc, dzc, _ = refined(kkt, zn, zp, rhs_zc, steps=0)
            dz_sc_c = dd_ops.apply_W(layout, scaling, dzc)
            ds_sc_c = ddm.add(dtil_c, dz_sc_c).neg()
            c_ds_sc = ddm.add(ds_sc, ds_sc_c)
            c_dz_sc = ddm.add(dz_sc, dz_sc_c)
            alpha_c = dd_ops.max_step_pair(layout, lam, c_ds_sc, c_dz_sc)
            alpha_c = jnp.minimum(1.0, cfg.step_frac * alpha_c)
            accept = alpha_c >= alpha + 0.01
            dx = ddm.where(accept, ddm.add(dx, dxc), dx)
            dy = ddm.where(accept, ddm.add(dy, dyc), dy)
            dz = ddm.where(accept, ddm.add(dz, dzc), dz)
            ds_sc = ddm.where(accept, c_ds_sc, ds_sc)
            dz_sc = ddm.where(accept, c_dz_sc, dz_sc)
            alpha = jnp.where(accept, alpha_c, alpha)

        ds = dd_ops.apply_W(layout, scaling, ds_sc)

        step_finite = (
            jnp.isfinite(alpha)
            & (alpha > 0)
            & jnp.isfinite(jnp.sum(dx.hi * dx.hi))
            & jnp.isfinite(jnp.sum(ds.hi * ds.hi))
            & jnp.isfinite(jnp.sum(dz.hi * dz.hi))
        )
        stalled = quality > cfg.solve_quality_tol
        numerr = ~step_finite | ~jnp.isfinite(gap) | stalled

        new_status = jnp.where(
            converged,
            Status.OPTIMAL,
            jnp.where(
                pinf,
                Status.PRIMAL_INFEASIBLE,
                jnp.where(
                    dinf,
                    Status.DUAL_INFEASIBLE,
                    jnp.where(numerr, Status.NUMERICAL_ERROR, Status.RUNNING),
                ),
            ),
        ).astype(jnp.int32)
        done_now = new_status != Status.RUNNING
        freeze = st.done | done_now

        if cfg.verbose:
            jax.debug.print(
                "{k:3d} pcost={pc:+.6e} dcost={dc:+.6e} gap={g:.3e} "
                "pres={pr:.3e} dres={dr:.3e} step={a:.3f} kktres={q:.1e}",
                k=st.k, pc=pcost, dc=dcost, g=gap, pr=pres, dr=dres,
                a=alpha, q=quality,
            )

        def upd(old: DD, delta: DD) -> DD:
            return ddm.where(freeze, old, _axpy(old, alpha, delta))

        hist = st.hist
        if cfg.collect_history:
            row = jnp.stack([pcost, dcost, gap, pres, dres,
                             jnp.where(freeze, 0.0, alpha)])
            hist = jnp.where(st.done, hist, hist.at[st.k].set(row))

        return DDIPMState(
            x=upd(x, dx),
            y=upd(y, dy),
            z=upd(z, dz),
            s=upd(s, ds),
            k=jnp.where(freeze, st.k, st.k + 1),
            status=jnp.where(st.done, st.status, new_status),
            done=freeze,
            best_merit=best_merit,
            bx=bx, by=by, bs=bs, bz_=bz_,
            hist=hist,
        )

    st = lax.while_loop(
        lambda st: (~st.done) & (st.k < cfg.max_iter), body, st0
    )
    status = jnp.where(st.done, st.status, Status.MAX_ITERATIONS).astype(
        jnp.int32
    )

    restore = (status == Status.NUMERICAL_ERROR) | (
        status == Status.MAX_ITERATIONS
    )

    # Relaxed exit certificates on the FINAL iterate (mirror of
    # ipm/driver.py): the stall guard often fires a couple of iterations
    # before the strict in-loop certificate threshold is reached, and the
    # final iterate carries the strongest approximate Farkas ray.
    rxf, ryf, rzf, Pxf = residuals(st.x, st.y, st.s, st.z)
    hz_by_f = dd_ops.dd_dot(h, st.z, axis=0).hi + (
        dd_ops.dd_dot(st.y, b, axis=0).hi if p else 0.0
    )
    pvec_f = (ddm.sub(ddm.sub(rxf, c), Pxf) if has_P
              else ddm.sub(rxf, c))
    pinf_exit = restore & (hz_by_f < 0) & (
        _norm(pvec_f) <= cfg.feastol_inacc * -hz_by_f
    )
    cx_f = dd_ops.dd_dot(c, st.x, axis=0).hi
    dres_f = jnp.maximum(
        _norm(ddm.add(ryf, b)) if p else 0.0, _norm(ddm.add(rzf, h))
    )
    if has_P:
        dres_f = jnp.maximum(dres_f, _norm(Pxf))
    dinf_exit = restore & (cx_f < 0) & (dres_f <= cfg.feastol_inacc * -cx_f)

    x = ddm.where(restore, st.bx, st.x)
    y = ddm.where(restore, st.by, st.y)
    s = ddm.where(restore, st.bs, st.s)
    z = ddm.where(restore, st.bz_, st.z)

    rx, ry, rz, Px = residuals(x, y, s, z)
    gap, pcost, dcost, relgap, pres, dres = metrics(
        x, y, s, z, rx, ry, rz, Px
    )
    inacc_ok = (
        (pres <= cfg.feastol_inacc)
        & (dres <= cfg.feastol_inacc)
        & ((gap <= cfg.abstol_inacc) | (relgap <= cfg.reltol_inacc))
    )
    cert = ~inacc_ok & (pinf_exit | dinf_exit)
    x = ddm.where(cert, st.x, x)
    y = ddm.where(cert, st.y, y)
    s = ddm.where(cert, st.s, s)
    z = ddm.where(cert, st.z, z)
    status = jnp.where(
        restore & inacc_ok,
        Status.OPTIMAL,
        jnp.where(
            pinf_exit & ~inacc_ok,
            Status.PRIMAL_INFEASIBLE,
            jnp.where(dinf_exit & ~inacc_ok & ~pinf_exit,
                      Status.DUAL_INFEASIBLE, status),
        ),
    ).astype(jnp.int32)
    inaccurate = restore & inacc_ok

    stats = jnp.stack(
        [pcost, dcost, gap, relgap, pres, dres,
         inaccurate.astype(jnp.float32)]
    )
    # Exit conversion: hi + lo summed in f64 so the sub-ulp lo word is not
    # lost (an f32 sum rounds straight back to hi).  One-time O(n) emulated
    # f64 work; with x64 disabled astype_f64 degrades to the f32 hi word.
    def out(v: DD):
        return v.astype_f64()

    if jax.config.jax_enable_x64:
        stats = stats.astype(jnp.float64)
    return out(x), out(y), out(s), out(z), status, st.k, stats, st.hist
