"""The jitted IPM driver: one `lax.while_loop`, everything else is pure jnp.

Call-stack mirror of the oracle (SURVEY.md section 3.1), TPU-first:
  * the whole solve is ONE jit-compiled function (static shapes, static
    layout/config) — device-host sync only at entry/exit;
  * the loop carry is a pytree `IPMState`; updates are masked by a `done`
    flag so the identical code runs single-instance and under `vmap`
    (lockstep batching with per-instance convergence, SURVEY.md 2.3 DP row);
  * termination / infeasibility certificates / NaN guards / direction-
    quality stall fold into a single status-select per iteration;
  * the best-merit iterate is tracked in the carry and restored on any
    non-optimal exit; if it meets the relaxed (inaccurate) tolerances the
    solve is accepted as optimal — ECOS-style stall handling, essential for
    the f32-factor mixed-precision mode whose achievable floor can sit just
    above the strict tolerances.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from socp_tpu.cones import ops as cops
from socp_tpu.cones.layout import ConeLayout
from socp_tpu.config import SolverConfig
from socp_tpu.kkt import dense
from socp_tpu.solution import Status


class IPMState(NamedTuple):
    x: jax.Array
    y: jax.Array
    s: jax.Array
    z: jax.Array
    k: jax.Array          # completed body executions (= factorizations)
    status: jax.Array     # Status int code; RUNNING while iterating
    done: jax.Array       # bool
    # best-merit iterate seen so far (restored on non-optimal exit)
    best_merit: jax.Array
    bx: jax.Array
    by: jax.Array
    bs: jax.Array
    bz_: jax.Array
    # per-iteration table (cfg.collect_history; (max_iter, 6) else (0, 6))
    hist: jax.Array


def _norm(v):
    return jnp.linalg.norm(v) if v.shape[0] else jnp.asarray(0.0, v.dtype)


@partial(jax.jit, static_argnames=("layout", "cfg", "has_P"))
def solve_core(
    layout: ConeLayout,
    cfg: SolverConfig,
    c: jax.Array,
    G: jax.Array,
    h: jax.Array,
    A: jax.Array,
    b: jax.Array,
    P: jax.Array,          # (n, n); pass zeros(0,0) when has_P=False
    has_P: bool = False,
    warm: tuple | None = None,
):
    """Solve one (padded) SOCP.  All args device arrays; layout/cfg static.

    `warm`: optional (x, y, s, z) start — skips the W=I init solves and
    recenters s, z by cfg.warm_push (see ipm/dd_driver.py).

    Returns (x, y, s, z, status, iterations, stats_vector) with stats =
    [pcost, dcost, gap, relgap, pres, dres, inaccurate_flag].
    """
    dtype = c.dtype
    n = c.shape[0]
    p = A.shape[0]
    m = layout.m_pad
    nu = jnp.asarray(float(layout.degree), dtype)
    e = cops.identity(layout, dtype)
    Pmat = P if has_P else None

    norm_b = jnp.maximum(1.0, _norm(b))
    norm_h = jnp.maximum(1.0, _norm(h))
    norm_c = jnp.maximum(1.0, _norm(c))

    # Augmented-Lagrangian condensation term (constant across iterations;
    # see socp_tpu.kkt.dense module doc).
    aug_rho = cfg.aug_rho if p else 0.0
    if aug_rho:
        Paug = aug_rho * (A.T @ A)
        if has_P:
            Paug = Paug + P
    else:
        Paug = Pmat

    def residuals(x, y, s, z):
        Px = P @ x if has_P else None
        rx = A.T @ y + G.T @ z + c
        if has_P:
            rx = rx + Px
        ry = A @ x - b
        rz = G @ x + s - h
        return rx, ry, rz, Px

    def metrics(x, y, s, z, rx, ry, rz, Px):
        gap = s @ z
        pcost = c @ x + (0.5 * x @ Px if has_P else 0.0)
        dcost = pcost + y @ ry + z @ rz - gap
        relgap = jnp.where(
            pcost < 0,
            gap / -pcost,
            jnp.where(dcost > 0, gap / dcost, jnp.inf),
        )
        pres = jnp.maximum(_norm(ry) / norm_b, _norm(rz) / norm_h)
        dres = _norm(rx) / norm_c
        return gap, pcost, dcost, relgap, pres, dres

    def refined(kkt, bx, by, bz, steps=None):
        return dense.solve_refined(
            layout, kkt, Pmat, A, G, bx, by, bz,
            refine_steps=cfg.refine_steps if steps is None else steps,
            refine_in_f64=cfg.refine_in_f64,
            aug_rho=aug_rho,
        )

    # ---- initialization: warm start or W = I least-squares solves + shift
    if warm is not None:
        xw, yw, sw, zw = (jnp.asarray(w, dtype) for w in warm)
        x0, y0 = xw, yw
        # Recentering scale: a converged point has s_i z_i ~ 1e-8, i.e.
        # MAXIMALLY uncentered relative to any common mu — lifting by a
        # mu_w-derived margin (~1e-4 of nothing) leaves the start erratic
        # (measured).  Lift relative to the iterate's own magnitude so the
        # shifted products spread over ~1/warm_push, a modest centrality
        # the predictor-corrector digests in a couple of iterations.
        scale = 0.5 * (jnp.mean(jnp.abs(sw)) + jnp.mean(jnp.abs(zw))) + 1e-8
        margin = jnp.asarray(cfg.warm_push, dtype) * scale
        s0 = sw + jnp.maximum(margin - cops.lambda_min(layout, sw), 0.0) * e
        z0 = zw + jnp.maximum(margin - cops.lambda_min(layout, zw), 0.0) * e
    else:
        sc0 = cops.identity_scaling(layout, dtype)
        kkt0 = dense.factor(layout, sc0, Paug, A, G, cfg.delta_reg,
                            factor_dtype=cfg.factor_dtype)
        x0, _, z0, _ = refined(kkt0, jnp.zeros((n,), dtype), b, h)
        shat = -z0
        ap = -cops.lambda_min(layout, shat)
        s0 = jnp.where(ap < 0, shat, shat + (1.0 + ap) * e)
        _, y0, zhat, _ = refined(
            kkt0, -c, jnp.zeros((p,), dtype), jnp.zeros((m,), dtype)
        )
        ad = -cops.lambda_min(layout, zhat)
        z0 = jnp.where(ad < 0, zhat, zhat + (1.0 + ad) * e)

    n_hist = cfg.max_iter if cfg.collect_history else 0
    st0 = IPMState(
        x=x0, y=y0, s=s0, z=z0,
        k=jnp.zeros((), jnp.int32),
        status=jnp.full((), Status.RUNNING, jnp.int32),
        done=jnp.zeros((), bool),
        best_merit=jnp.asarray(jnp.inf, dtype),
        bx=x0, by=y0, bs=s0, bz_=z0,
        hist=jnp.zeros((n_hist, 6), dtype),
    )

    def body(st: IPMState) -> IPMState:
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

        # best-iterate tracking (merit: worst normalized optimality measure)
        merit = jnp.maximum(jnp.maximum(pres, dres),
                            jnp.minimum(relgap, gap))
        better = (merit < st.best_merit) & ~st.done
        best_merit = jnp.where(better, merit, st.best_merit)
        bx = jnp.where(better, x, st.bx)
        by = jnp.where(better, y, st.by)
        bs = jnp.where(better, s, st.bs)
        bz_ = jnp.where(better, z, st.bz_)

        # Farkas-style infeasibility certificates (oracle-identical), read
        # off the residuals instead of fresh matvecs: A'y + G'z = rx - c
        # (- Px), Ax = ry + b, Gx + s = rz + h.
        hz_by = h @ z + (y @ b if p else 0.0)
        pinf_vec = rx - c - Px if has_P else rx - c
        pinf_res = _norm(pinf_vec)
        pinf = (hz_by < 0) & (pinf_res <= cfg.feastol * -hz_by)
        cx = c @ x
        dinf_res = jnp.maximum(_norm(ry + b), _norm(rz + h))
        if has_P:
            dinf_res = jnp.maximum(dinf_res, _norm(Px))
        dinf = (cx < 0) & (dinf_res <= cfg.feastol * -cx)

        # ---- NT scaling + KKT factor (the hot block)
        scaling = cops.nt_scale(layout, s, z)
        kkt = dense.factor(layout, scaling, Paug, A, G, cfg.delta_reg,
                           factor_dtype=cfg.factor_dtype)
        lam = scaling.lam

        def newton(d_s, steps=None):
            """Direction for complementarity target d_s; returns scaled
            ds/dz too (dz_sc = W dz, ds = W ds_sc)."""
            dtil = cops.jdiv(layout, lam, d_s)
            dx, dy, dz, quality = refined(
                kkt, -rx, -ry, -rz + cops.apply_W(layout, scaling, dtil),
                steps=steps,
            )
            dz_sc = cops.apply_W(layout, scaling, dz)
            ds_sc = -(dtil + dz_sc)
            return dx, dy, dz, ds_sc, dz_sc, quality

        # affine (predictor)
        lam2 = cops.jprod(layout, lam, lam)
        dx_a, dy_a, dz_a, ds_sc_a, dz_sc_a, _ = newton(
            lam2, steps=cfg.refine_affine
        )
        alpha_a = jnp.minimum(
            cops.max_step(layout, lam, ds_sc_a),
            cops.max_step(layout, lam, dz_sc_a),
        )
        alpha_a = jnp.minimum(1.0, alpha_a)
        gap_a = (lam + alpha_a * ds_sc_a) @ (lam + alpha_a * dz_sc_a)
        sigma = jnp.clip(gap_a / gap, 0.0, 1.0) ** 3

        # combined (corrector) with second-order term
        d_s = lam2 + cops.jprod(layout, ds_sc_a, dz_sc_a) - sigma * mu * e
        dx, dy, dz, ds_sc, dz_sc, quality = newton(d_s)

        alpha = jnp.minimum(
            cops.max_step(layout, lam, ds_sc),
            cops.max_step(layout, lam, dz_sc),
        )
        alpha = jnp.minimum(1.0, cfg.step_frac * alpha)

        # ---- Gondzio multiple centrality correctors (config.py): push the
        # trial point's outlier Jordan products into [0.1, 10] x sigma*mu
        # with one extra unrefined back-solve each; accept per instance
        # only if the cone step lengthens by >= 0.01.
        for _ in range(cfg.gondzio_correctors or 0):
            mu_t = sigma * mu
            a_hat = jnp.minimum(alpha / cfg.step_frac + 0.1, 1.0)
            v_s = lam + a_hat * ds_sc
            v_z = lam + a_hat * dz_sc
            vprod = cops.jprod(layout, v_s, v_z)
            t = cops.eig_clip_delta(layout, vprod,
                                    0.1 * mu_t, 10.0 * mu_t)
            # corrector Newton: zero residual parts, target lam o (ds+dz)=t
            dtil_c = cops.jdiv(layout, lam, -t)
            rhs_zc = cops.apply_W(layout, scaling, dtil_c)
            dxc, dyc, dzc, _ = refined(
                kkt, jnp.zeros((n,), dtype), jnp.zeros((p,), dtype),
                rhs_zc, steps=0,
            )
            dz_sc_c = cops.apply_W(layout, scaling, dzc)
            ds_sc_c = -(dtil_c + dz_sc_c)
            c_ds_sc = ds_sc + ds_sc_c
            c_dz_sc = dz_sc + dz_sc_c
            alpha_c = jnp.minimum(
                cops.max_step(layout, lam, c_ds_sc),
                cops.max_step(layout, lam, c_dz_sc),
            )
            alpha_c = jnp.minimum(1.0, cfg.step_frac * alpha_c)
            accept = alpha_c >= alpha + 0.01
            dx = jnp.where(accept, dx + dxc, dx)
            dy = jnp.where(accept, dy + dyc, dy)
            dz = jnp.where(accept, dz + dzc, dz)
            ds_sc = jnp.where(accept, c_ds_sc, ds_sc)
            dz_sc = jnp.where(accept, c_dz_sc, dz_sc)
            alpha = jnp.where(accept, alpha_c, alpha)

        ds = cops.apply_W(layout, scaling, ds_sc)

        step_finite = (
            jnp.isfinite(alpha)
            & (alpha > 0)
            & jnp.isfinite(dx @ dx)
            & jnp.isfinite(ds @ ds)
            & jnp.isfinite(dz @ dz)
        )
        # direction-quality stall: the factorization can no longer produce
        # usable Newton directions (f32 floor / extreme conditioning)
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

        def upd(old, delta):
            return jnp.where(freeze, old, old + alpha * delta)

        hist = st.hist
        if cfg.collect_history:
            row = jnp.stack([pcost, dcost, gap, pres, dres,
                             jnp.where(freeze, 0.0, alpha)])
            hist = jnp.where(
                st.done, hist, hist.at[st.k].set(row.astype(hist.dtype))
            )

        return IPMState(
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

    def cond(st: IPMState):
        return (~st.done) & (st.k < cfg.max_iter)

    st = lax.while_loop(cond, body, st0)
    status = jnp.where(st.done, st.status, Status.MAX_ITERATIONS).astype(
        jnp.int32
    )

    # ---- best-iterate restoration + inaccurate acceptance
    # On a non-optimal, non-certificate exit, return the best iterate seen;
    # accept as optimal (flagged inaccurate) if it meets the relaxed
    # tolerances.
    restore = (status == Status.NUMERICAL_ERROR) | (
        status == Status.MAX_ITERATIONS
    )

    # Relaxed exit certificates on the FINAL iterate: for an infeasible
    # problem the Farkas ray grows monotonically, and the direction-quality
    # stall guard often fires a couple of iterations before the strict
    # in-loop (feastol-grade) certificate threshold is reached.  The final
    # iterate carries the strongest approximate certificate, so test it at
    # the relaxed feastol_inacc before falling back to the best iterate.
    rxf, ryf, rzf, Pxf = residuals(st.x, st.y, st.s, st.z)
    hz_by_f = h @ st.z + (st.y @ b if p else 0.0)
    pvec_f = rxf - c - Pxf if has_P else rxf - c
    pinf_exit = restore & (hz_by_f < 0) & (
        _norm(pvec_f) <= cfg.feastol_inacc * -hz_by_f
    )
    cx_f = c @ st.x
    dres_f = jnp.maximum(_norm(ryf + b), _norm(rzf + h))
    if has_P:
        dres_f = jnp.maximum(dres_f, _norm(Pxf))
    dinf_exit = restore & (cx_f < 0) & (dres_f <= cfg.feastol_inacc * -cx_f)

    x = jnp.where(restore, st.bx, st.x)
    y = jnp.where(restore, st.by, st.y)
    s = jnp.where(restore, st.bs, st.s)
    z = jnp.where(restore, st.bz_, st.z)

    rx, ry, rz, Px = residuals(x, y, s, z)
    gap, pcost, dcost, relgap, pres, dres = metrics(
        x, y, s, z, rx, ry, rz, Px
    )
    inacc_ok = (
        (pres <= cfg.feastol_inacc)
        & (dres <= cfg.feastol_inacc)
        & ((gap <= cfg.abstol_inacc) | (relgap <= cfg.reltol_inacc))
    )
    # priority: relaxed-optimal > primal cert > dual cert > raw exit status
    cert = ~inacc_ok & (pinf_exit | dinf_exit)
    x = jnp.where(cert, st.x, x)
    y = jnp.where(cert, st.y, y)
    s = jnp.where(cert, st.s, s)
    z = jnp.where(cert, st.z, z)
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
         inaccurate.astype(pcost.dtype)]
    )
    return x, y, s, z, status, st.k, stats, st.hist
