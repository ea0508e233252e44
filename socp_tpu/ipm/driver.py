"""The jitted IPM driver: one `lax.while_loop`, everything else is pure jnp.

Call-stack mirror of the oracle (SURVEY.md section 3.1), TPU-first:
  * the whole solve is ONE jit-compiled function (static shapes, static
    layout/config) — device-host sync only at entry/exit;
  * the loop carry is a pytree `IPMState`; updates are masked by a `done`
    flag so the identical code runs single-instance and under `vmap`
    (lockstep batching with per-instance convergence, SURVEY.md 2.3 DP row);
  * termination / infeasibility certificates / NaN guards fold into a
    single status-select per iteration.
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
    k: jax.Array        # completed body executions (= factorizations)
    status: jax.Array   # Status int code; RUNNING while iterating
    done: jax.Array     # bool


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
):
    """Solve one (padded) SOCP.  All args device arrays; layout/cfg static.

    Returns (x, y, s, z, status, iterations, stats_vector).
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
        rx = A.T @ y + G.T @ z + c
        if has_P:
            rx = rx + P @ x
        ry = A @ x - b
        rz = G @ x + s - h
        return rx, ry, rz

    # ---- initialization: W = I least-squares KKT solves + interior shift
    sc0 = cops.identity_scaling(layout, dtype)
    kkt0 = dense.factor(layout, sc0, Paug, A, G, cfg.delta_reg)
    x0, _, z0 = dense.solve(layout, kkt0, A, jnp.zeros((n,), dtype), b, h,
                            aug_rho=aug_rho)
    shat = -z0
    ap = -cops.lambda_min(layout, shat)
    s0 = jnp.where(ap < 0, shat, shat + (1.0 + ap) * e)
    _, y0, zhat = dense.solve(
        layout, kkt0, A, -c, jnp.zeros((p,), dtype), jnp.zeros((m,), dtype),
        aug_rho=aug_rho,
    )
    ad = -cops.lambda_min(layout, zhat)
    z0 = jnp.where(ad < 0, zhat, zhat + (1.0 + ad) * e)

    st0 = IPMState(
        x=x0,
        y=y0,
        s=s0,
        z=z0,
        k=jnp.zeros((), jnp.int32),
        status=jnp.full((), Status.RUNNING, jnp.int32),
        done=jnp.zeros((), bool),
    )

    def body(st: IPMState) -> IPMState:
        x, y, s, z = st.x, st.y, st.s, st.z
        rx, ry, rz = residuals(x, y, s, z)
        gap = s @ z
        mu = gap / nu

        pcost = c @ x + (0.5 * x @ (P @ x) if has_P else 0.0)
        dcost = pcost + y @ ry + z @ rz - gap
        relgap = jnp.where(
            pcost < 0,
            gap / -pcost,
            jnp.where(dcost > 0, gap / dcost, jnp.inf),
        )
        pres = jnp.maximum(_norm(ry) / norm_b, _norm(rz) / norm_h)
        dres = _norm(rx) / norm_c
        converged = (
            (pres <= cfg.feastol)
            & (dres <= cfg.feastol)
            & ((gap <= cfg.abstol) | (relgap <= cfg.reltol))
        )

        # Farkas-style infeasibility certificates (oracle-identical).
        hz_by = h @ z + (y @ b if p else 0.0)
        pinf_res = _norm(A.T @ y + G.T @ z)
        pinf = (hz_by < 0) & (pinf_res <= cfg.feastol * -hz_by)
        cx = c @ x
        dinf_res = jnp.maximum(_norm(A @ x), _norm(G @ x + s))
        if has_P:
            dinf_res = jnp.maximum(dinf_res, _norm(P @ x))
        dinf = (cx < 0) & (dinf_res <= cfg.feastol * -cx)

        # ---- NT scaling + KKT factor (the hot block)
        scaling = cops.nt_scale(layout, s, z)
        kkt = dense.factor(layout, scaling, Paug, A, G, cfg.delta_reg)
        lam = scaling.lam

        def newton(d_s):
            """Direction for complementarity target d_s; returns scaled
            ds/dz too (dz_sc = W dz, ds = W ds_sc)."""
            dtil = cops.jdiv(layout, lam, d_s)
            dx, dy, dz = dense.solve_refined(
                layout, kkt, Pmat, A, G,
                -rx, -ry, -rz + cops.apply_W(layout, scaling, dtil),
                refine_steps=cfg.refine_steps,
                refine_in_f64=cfg.refine_in_f64,
                aug_rho=aug_rho,
            )
            dz_sc = cops.apply_W(layout, scaling, dz)
            ds_sc = -(dtil + dz_sc)
            return dx, dy, dz, ds_sc, dz_sc

        # affine (predictor)
        lam2 = cops.jprod(layout, lam, lam)
        dx_a, dy_a, dz_a, ds_sc_a, dz_sc_a = newton(lam2)
        alpha_a = jnp.minimum(
            cops.max_step(layout, lam, ds_sc_a),
            cops.max_step(layout, lam, dz_sc_a),
        )
        alpha_a = jnp.minimum(1.0, alpha_a)
        gap_a = (lam + alpha_a * ds_sc_a) @ (lam + alpha_a * dz_sc_a)
        sigma = jnp.clip(gap_a / gap, 0.0, 1.0) ** 3

        # combined (corrector) with second-order term
        d_s = lam2 + cops.jprod(layout, ds_sc_a, dz_sc_a) - sigma * mu * e
        dx, dy, dz, ds_sc, dz_sc = newton(d_s)
        ds = cops.apply_W(layout, scaling, ds_sc)

        alpha = jnp.minimum(
            cops.max_step(layout, lam, ds_sc),
            cops.max_step(layout, lam, dz_sc),
        )
        alpha = jnp.minimum(1.0, cfg.step_frac * alpha)

        step_finite = (
            jnp.isfinite(alpha)
            & (alpha > 0)
            & jnp.isfinite(dx @ dx)
            & jnp.isfinite(ds @ ds)
            & jnp.isfinite(dz @ dz)
        )
        numerr = ~step_finite | ~jnp.isfinite(gap)

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
                "pres={pr:.3e} dres={dr:.3e} step={a:.3f}",
                k=st.k, pc=pcost, dc=dcost, g=gap, pr=pres, dr=dres, a=alpha,
            )

        def upd(old, delta):
            return jnp.where(freeze, old, old + alpha * delta)

        return IPMState(
            x=upd(x, dx),
            y=upd(y, dy),
            z=upd(z, dz),
            s=upd(s, ds),
            k=jnp.where(freeze, st.k, st.k + 1),
            status=jnp.where(st.done, st.status, new_status),
            done=freeze,
        )

    def cond(st: IPMState):
        return (~st.done) & (st.k < cfg.max_iter)

    st = lax.while_loop(cond, body, st0)
    status = jnp.where(st.done, st.status, Status.MAX_ITERATIONS).astype(jnp.int32)

    # final stats (recomputed once at exit)
    rx, ry, rz = residuals(st.x, st.y, st.s, st.z)
    gap = st.s @ st.z
    pcost = c @ st.x + (0.5 * st.x @ (P @ st.x) if has_P else 0.0)
    dcost = pcost + st.y @ ry + st.z @ rz - gap
    relgap = jnp.where(
        pcost < 0, gap / -pcost, jnp.where(dcost > 0, gap / dcost, jnp.inf)
    )
    pres = jnp.maximum(_norm(ry) / norm_b, _norm(rz) / norm_h)
    dres = _norm(rx) / norm_c
    stats = jnp.stack([pcost, dcost, gap, relgap, pres, dres])
    return st.x, st.y, st.s, st.z, status, st.k, stats
