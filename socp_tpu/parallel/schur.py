"""Block-partitioned KKT with mesh-distributed Schur reduction (M4;
SURVEY.md 2.3 TP row and section 5 long-context entry).

Problem class: K structurally identical blocks coupled only through p
shared equality constraints,

    minimize    sum_i [ (1/2) x_i' P_i x_i + c_i' x_i ]
    subject to  sum_i A_i x_i = b                      (coupling)
                G_i x_i + s_i = h_i,  s_i in K_b        (per-block cones)

(BASELINE config 4: n = K*nb up to 100k vars, 10k cones.)  The condensed
KKT is block-diagonal H_i = P_i + Ghat_i'Ghat_i plus the p x p Schur
complement of the coupling rows,

    S = sum_i A_i H_i^-1 A_i'      <- THE collective: one psum over the mesh

so one IPM iteration is a single jitted SPMD step: per-block Cholesky
factorizations run locally on each device's shard of blocks, S is
psum-reduced over ICI, chol(S) and dy are computed replicated, and the
back-substitution is local again.  All other cross-block reductions (gap,
residual norms, max-step) are scalar psum/pmin.

Well-posedness: each block needs rank([P_i; G_i]) = nb (there is no
rho*A'A augmentation here — it would densify the block structure); the
equilibrated delta regularization covers numerical rank deficiency.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from socp_tpu.cones import ops as cops
from socp_tpu.cones.layout import ConeLayout, make_layout
from socp_tpu.config import DEFAULT_CONFIG, SolverConfig
from socp_tpu.kkt.dense import EqChol, _eq_chol
from socp_tpu.problem import ConeDims
from socp_tpu.solution import Status


@dataclasses.dataclass
class BlockSocpProblem:
    """K identical-shape blocks + p coupling equalities (host-side NumPy)."""

    c: np.ndarray            # (K, nb)
    G: np.ndarray            # (K, mb, nb)
    h: np.ndarray            # (K, mb)
    block_dims: ConeDims     # cone of ONE block (dim == mb)
    A: np.ndarray            # (K, p, nb) coupling: sum_i A_i x_i = b
    b: np.ndarray            # (p,)
    P: Optional[np.ndarray] = None   # (K, nb, nb)

    def __post_init__(self):
        K, nb = self.c.shape
        assert self.G.shape == (K, self.block_dims.dim, nb)
        assert self.h.shape == (K, self.block_dims.dim)
        assert self.A.shape[0] == K and self.A.shape[2] == nb
        assert self.b.shape == (self.A.shape[1],)

    @property
    def n_blocks(self) -> int:
        return self.c.shape[0]


class BlockState(NamedTuple):
    x: jax.Array      # (Kl, nb)
    y: jax.Array      # (p,) replicated
    s: jax.Array      # (Kl, mb_pad)
    z: jax.Array      # (Kl, mb_pad)
    k: jax.Array
    status: jax.Array
    done: jax.Array
    # best-merit iterate (restored on non-optimal exit; ECOS-style
    # "optimal, inaccurate" acceptance — parity with ipm/driver.py)
    best_merit: jax.Array
    bx: jax.Array
    by: jax.Array
    bs: jax.Array
    bz_: jax.Array
    hist: jax.Array   # (max_iter, 6) when cfg.collect_history, else (0, 6)


def _core(layout: ConeLayout, cfg: SolverConfig, axis: str, ndev: int,
          has_P: bool, c, G, h, A, b, Pq):
    """SPMD body (runs under shard_map): local shard of blocks + collectives."""
    dtype = c.dtype
    Kl, nb = c.shape
    p = b.shape[0]

    # vmapped cone kernels over the local block axis
    v_nt = jax.vmap(functools.partial(cops.nt_scale, layout))
    v_W = jax.vmap(functools.partial(cops.apply_W, layout))
    v_Winv = jax.vmap(functools.partial(cops.apply_Winv, layout))
    v_rows = jax.vmap(functools.partial(cops.scale_rows_Winv, layout))
    v_jprod = jax.vmap(functools.partial(cops.jprod, layout))
    v_jdiv = jax.vmap(functools.partial(cops.jdiv, layout))
    v_lmin = jax.vmap(functools.partial(cops.lambda_min, layout))
    v_maxstep = jax.vmap(functools.partial(cops.max_step, layout))
    v_eigclip = jax.vmap(functools.partial(cops.eig_clip_delta, layout),
                         in_axes=(0, None, None))
    v_chol = jax.vmap(functools.partial(_eq_chol, delta=cfg.delta_reg))
    v_solve = jax.vmap(lambda f, r: f.solve(r))

    # On a 1-device mesh every collective is the identity; eliding them also
    # sidesteps AOT toolchains that only lower Sum all-reduces (the axon
    # single-chip compiler rejects the Min computation of lax.pmin).
    def psum(v):
        return lax.psum(v, axis) if ndev > 1 else v

    def pmin(v):
        return lax.pmin(v, axis) if ndev > 1 else v

    def schur_reduce(S_loc):
        """The ONE large collective per factor: sum of the local (p, p)
        Schur contributions.  Ring (ppermute hops, overlappable with the
        replicated chol(S) panel work that follows) or monolithic psum."""
        if cfg.ring_schur and ndev > 1:
            from socp_tpu.parallel.collectives import ring_allreduce

            return ring_allreduce(S_loc, axis, ndev,
                                  n_chunks=min(4, max(S_loc.shape[-1], 1)))
        return psum(S_loc)

    def gnorm(local_sq):
        """Global 2-norm from local sum-of-squares."""
        return jnp.sqrt(psum(local_sq))

    e1 = cops.identity(layout, dtype)                 # one block identity
    e = jnp.broadcast_to(e1, (Kl, layout.m_pad))
    nu_total = jnp.asarray(
        float(layout.degree), dtype
    ) * psum(jnp.asarray(float(Kl), dtype))

    norm_b = jnp.maximum(1.0, jnp.linalg.norm(b))
    norm_h = jnp.maximum(1.0, gnorm(jnp.sum(h * h)))
    norm_c = jnp.maximum(1.0, gnorm(jnp.sum(c * c)))

    def quad(x):
        if not has_P:
            return 0.0
        return 0.5 * psum(jnp.sum(x * jnp.einsum("kij,kj->ki", Pq, x)))

    # dd32 mode: the O(mb*nb^2)/O(nb^3) per-block factor pipeline and every
    # O(mb*nb) matvec run in double-word f32 on the MXU (same scheme as
    # kkt/dd_dense.py); only the small (p,)-sized coupling pieces, cone ops,
    # and norms stay in (emulated) f64.  On TPU this is the difference
    # between the factor riding the MXU and it being ~100x-slow f64
    # emulation; results still certify 1e-8 gaps via refinement.
    use_dd = cfg.factor_dtype == "dd32"
    if use_dd:
        from socp_tpu.kkt.dd_dense import _dd_eq_chol, sliced_matvec
        from socp_tpu.ops import dd as ddm
        from socp_tpu.ops.ozaki import dd_matmul, preslice, sliced_gram

        v_pre = jax.vmap(lambda g: preslice(ddm.from_f64(g)))
        v_preT = jax.vmap(lambda g: preslice(ddm.from_f64(g.T)))
        v_gram = jax.vmap(sliced_gram)
        v_ddchol = jax.vmap(lambda H: _dd_eq_chol(H, cfg.delta_reg))
        v_ddsolve = jax.vmap(lambda f, r: f.solve(r))
        v_smv = jax.vmap(sliced_matvec)

        # constant problem data presliced once per solve
        G_s = v_pre(G)          # per block: v -> G_i v
        GT_s = v_preT(G)        # per block: v -> G_i' v
        A_dd = ddm.from_f64(A)

        def _mv(S, v64):
            """f64 (Kl, m) -> f64 (Kl, p) through a presliced dd matvec."""
            return v_smv(S, ddm.from_f64(v64)).astype_f64()

    class Factored(NamedTuple):
        LH: EqChol            # vmapped over blocks (f64 or DDEqChol)
        LS: EqChol            # replicated p x p (f64)
        Ghat: object          # (Kl, mb_pad, nb) f64, or (Ghat_s, GhatT_s)
        scaling: cops.Scaling  # vmapped

    def factor(scaling):
        Ghat = v_rows(scaling, G)
        if use_dd:
            GhatT_s = v_preT(Ghat)
            Ghat_s = v_pre(Ghat)
            H = v_gram(GhatT_s)
            if has_P:
                H = ddm.add(H, ddm.from_f64(Pq))
            LH = v_ddchol(H)
            HinvAT = v_ddsolve(LH, ddm.from_f64(jnp.swapaxes(A, 1, 2)))
            S_loc = jax.vmap(dd_matmul)(A_dd, HinvAT)        # (Kl, p, p)
            S = schur_reduce(jnp.sum(S_loc.astype_f64(), axis=0))
            LS = _eq_chol(S, cfg.delta_reg)
            return Factored(LH=LH, LS=LS, Ghat=(Ghat_s, GhatT_s),
                            scaling=scaling)
        H = jnp.einsum("kmn,kmq->knq", Ghat, Ghat)
        if has_P:
            H = H + Pq
        LH = v_chol(H)
        HinvAT = v_solve(LH, jnp.swapaxes(A, 1, 2))      # (Kl, nb, p)
        S = schur_reduce(jnp.einsum("kpn,knq->pq", A, HinvAT))
        LS = _eq_chol(S, cfg.delta_reg)
        return Factored(LH=LH, LS=LS, Ghat=Ghat, scaling=scaling)

    def kkt_solve_once(f: Factored, bx, by, bz):
        """bx (Kl,nb), by (p,) replicated, bz (Kl,mb_pad)."""
        bhz = v_Winv(f.scaling, bz)
        if use_dd:
            Ghat_s, GhatT_s = f.Ghat
            bhz_dd = ddm.from_f64(bhz)
            btx = ddm.add(ddm.from_f64(bx),
                          v_smv(GhatT_s, bhz_dd))            # dd (Kl, nb)
            t = v_ddsolve(f.LH, ddm.DD(btx.hi[..., None], btx.lo[..., None]))
            rhs_S = psum(
                jnp.einsum("kpn,kn->p", A, t.astype_f64()[..., 0])
            ) - by
            dy = f.LS.solve(rhs_S)
            corr = jnp.einsum("kpn,p->kn", A, dy)            # small f64
            rhs2 = ddm.sub(btx, ddm.from_f64(corr))
            dx_dd = v_ddsolve(
                f.LH, ddm.DD(rhs2.hi[..., None], rhs2.lo[..., None])
            )
            dx_col = ddm.DD(dx_dd.hi[..., 0], dx_dd.lo[..., 0])
            dx = dx_col.astype_f64()
            Gdx = v_smv(Ghat_s, dx_col).astype_f64()
            dz = v_Winv(f.scaling, Gdx - bhz)
            return dx, dy, dz
        btx = bx + jnp.einsum("kmn,km->kn", f.Ghat, bhz)
        t = v_solve(f.LH, btx)
        rhs_S = psum(jnp.einsum("kpn,kn->p", A, t)) - by
        dy = f.LS.solve(rhs_S)
        dx = v_solve(f.LH, btx - jnp.einsum("kpn,p->kn", A, dy))
        dz = v_Winv(f.scaling, jnp.einsum("kmn,kn->km", f.Ghat, dx) - bhz)
        return dx, dy, dz

    def _GT_dz(dz):
        return _mv(GT_s, dz) if use_dd else jnp.einsum("kmn,km->kn", G, dz)

    def _G_dx(dx):
        return _mv(G_s, dx) if use_dd else jnp.einsum("kmn,kn->km", G, dx)

    def kkt_solve(f: Factored, bx, by, bz):
        """Solve + iterative refinement on the block 3x3 residual
        (each round costs one extra psum + local back-solves).  Returns the
        post-refinement relative residual `quality` — the direction-quality
        stall signal (parity with ipm/driver.py: a direction whose KKT
        residual stays large is unusable; stop instead of stepping)."""
        dx, dy, dz = kkt_solve_once(f, bx, by, bz)
        quality = jnp.zeros((), dtype)
        if cfg.refine_steps <= 0:
            return dx, dy, dz, quality
        rhs_norm = jnp.sqrt(
            psum(jnp.sum(bx * bx) + jnp.sum(bz * bz)) + jnp.sum(by * by)
        ) + 1.0
        for _ in range(cfg.refine_steps):
            rx = bx - (jnp.einsum("kpn,p->kn", A, dy) + _GT_dz(dz))
            if has_P:
                rx = rx - jnp.einsum("kij,kj->ki", Pq, dx)
            ry = by - psum(jnp.einsum("kpn,kn->p", A, dx))
            WWdz = v_W(f.scaling, v_W(f.scaling, dz))
            rz = bz - (_G_dx(dx) - WWdz)
            quality = jnp.sqrt(
                psum(jnp.sum(rx * rx) + jnp.sum(rz * rz)) + jnp.sum(ry * ry)
            ) / rhs_norm
            ex, ey, ez = kkt_solve_once(f, rx, ry, rz)
            dx, dy, dz = dx + ex, dy + ey, dz + ez
        return dx, dy, dz, quality

    def residuals(x, y, s, z):
        rx = jnp.einsum("kpn,p->kn", A, y) + _GT_dz(z) + c
        if has_P:
            rx = rx + jnp.einsum("kij,kj->ki", Pq, x)
        ry = psum(jnp.einsum("kpn,kn->p", A, x)) - b
        rz = _G_dx(x) + s - h
        return rx, ry, rz

    # ---- init (W = I)
    sc0 = jax.vmap(lambda _: cops.identity_scaling(layout, dtype))(
        jnp.arange(Kl)
    )
    f0 = factor(sc0)
    x0, _, z0, _ = kkt_solve(f0, jnp.zeros((Kl, nb), dtype), b, h)
    shat = -z0
    ap = -pmin(jnp.min(v_lmin(shat)))
    s0 = jnp.where(ap < 0, shat, shat + (1.0 + ap) * e)
    _, y0, zhat, _ = kkt_solve(
        f0, -c, jnp.zeros((p,), dtype), jnp.zeros((Kl, layout.m_pad), dtype)
    )
    ad = -pmin(jnp.min(v_lmin(zhat)))
    z0 = jnp.where(ad < 0, zhat, zhat + (1.0 + ad) * e)

    n_hist = cfg.max_iter if cfg.collect_history else 0
    st0 = BlockState(
        x=x0, y=y0, s=s0, z=z0,
        k=jnp.zeros((), jnp.int32),
        status=jnp.full((), Status.RUNNING, jnp.int32),
        done=jnp.zeros((), bool),
        best_merit=jnp.asarray(jnp.inf, dtype),
        bx=x0, by=y0, bs=s0, bz_=z0,
        hist=jnp.zeros((n_hist, 6), dtype),
    )

    def body(st: BlockState) -> BlockState:
        x, y, s, z = st.x, st.y, st.s, st.z
        rx, ry, rz = residuals(x, y, s, z)
        gap = psum(jnp.sum(s * z))
        mu = gap / nu_total

        pcost = psum(jnp.sum(c * x)) + quad(x)
        dcost = pcost + y @ ry + psum(jnp.sum(z * rz)) - gap
        relgap = jnp.where(
            pcost < 0, gap / -pcost,
            jnp.where(dcost > 0, gap / dcost, jnp.inf),
        )
        pres = jnp.maximum(
            jnp.linalg.norm(ry) / norm_b, gnorm(jnp.sum(rz * rz)) / norm_h
        )
        dres = gnorm(jnp.sum(rx * rx)) / norm_c
        converged = (
            (pres <= cfg.feastol)
            & (dres <= cfg.feastol)
            & ((gap <= cfg.abstol) | (relgap <= cfg.reltol))
        )

        # Farkas certificates read off the residuals (zero extra matvecs):
        # A'y + G'z = rx - c (- Px), Ax = ry + b, Gx + s = rz + h.
        merit = jnp.maximum(jnp.maximum(pres, dres),
                            jnp.minimum(relgap, gap))
        better = (merit < st.best_merit) & ~st.done
        best_merit = jnp.where(better, merit, st.best_merit)
        bx = jnp.where(better, x, st.bx)
        by = jnp.where(better, y, st.by)
        bs = jnp.where(better, s, st.bs)
        bz_ = jnp.where(better, z, st.bz_)

        hz_by = psum(jnp.sum(h * z)) + y @ b
        aty_gtz = rx - c
        if has_P:
            aty_gtz = aty_gtz - jnp.einsum("kij,kj->ki", Pq, x)
        pinf = (hz_by < 0) & (
            gnorm(jnp.sum(aty_gtz * aty_gtz)) <= cfg.feastol * -hz_by
        )
        cx = psum(jnp.sum(c * x))
        gx_s = rz + h
        dinf_res = jnp.maximum(
            jnp.linalg.norm(ry + b),
            gnorm(jnp.sum(gx_s * gx_s)),
        )
        dinf = (cx < 0) & (dinf_res <= cfg.feastol * -cx)

        scaling = v_nt(s, z)
        fac = factor(scaling)
        lam = scaling.lam                     # (Kl, m_pad)

        def newton(d_s):
            dtil = v_jdiv(lam, d_s)
            dx, dy, dz, quality = kkt_solve(
                fac, -rx, -ry, -rz + v_W(scaling, dtil)
            )
            dz_sc = v_W(scaling, dz)
            ds_sc = -(dtil + dz_sc)
            return dx, dy, dz, ds_sc, dz_sc, quality

        lam2 = v_jprod(lam, lam)
        dx_a, dy_a, dz_a, ds_sc_a, dz_sc_a, _ = newton(lam2)
        alpha_a = jnp.minimum(
            pmin(jnp.min(v_maxstep(lam, ds_sc_a))),
            pmin(jnp.min(v_maxstep(lam, dz_sc_a))),
        )
        alpha_a = jnp.minimum(1.0, alpha_a)
        gap_a = psum(
            jnp.sum((lam + alpha_a * ds_sc_a) * (lam + alpha_a * dz_sc_a))
        )
        sigma = jnp.clip(gap_a / gap, 0.0, 1.0) ** 3

        d_s = lam2 + v_jprod(ds_sc_a, dz_sc_a) - sigma * mu * e
        dx, dy, dz, ds_sc, dz_sc, quality = newton(d_s)

        alpha = jnp.minimum(
            pmin(jnp.min(v_maxstep(lam, ds_sc))),
            pmin(jnp.min(v_maxstep(lam, dz_sc))),
        )
        alpha = jnp.minimum(1.0, cfg.step_frac * alpha)

        # ---- Gondzio centrality correctors (config.py / ipm/driver.py):
        # one extra UNREFINED block-KKT solve each (the block factors and
        # the Schur factor are reused; the psum in the Schur RHS is the
        # only extra collective), accepted only if the global step
        # lengthens — the accept scalar is replicated because alpha_c is
        # built from pmin-reduced quantities.
        for _ in range(cfg.gondzio_correctors or 0):
            mu_t = sigma * mu
            a_hat = jnp.minimum(alpha / cfg.step_frac + 0.1, 1.0)
            vprod = v_jprod(lam + a_hat * ds_sc, lam + a_hat * dz_sc)
            t = v_eigclip(vprod, 0.1 * mu_t, 10.0 * mu_t)
            dtil_c = v_jdiv(lam, -t)
            dxc, dyc, dzc = kkt_solve_once(
                fac, jnp.zeros_like(rx), jnp.zeros_like(ry),
                v_W(scaling, dtil_c),
            )
            dz_sc_c = v_W(scaling, dzc)
            ds_sc_c = -(dtil_c + dz_sc_c)
            c_ds_sc = ds_sc + ds_sc_c
            c_dz_sc = dz_sc + dz_sc_c
            alpha_c = jnp.minimum(
                pmin(jnp.min(v_maxstep(lam, c_ds_sc))),
                pmin(jnp.min(v_maxstep(lam, c_dz_sc))),
            )
            alpha_c = jnp.minimum(1.0, cfg.step_frac * alpha_c)
            accept = alpha_c >= alpha + 0.01
            dx = jnp.where(accept, dx + dxc, dx)
            dy = jnp.where(accept, dy + dyc, dy)
            dz = jnp.where(accept, dz + dzc, dz)
            ds_sc = jnp.where(accept, c_ds_sc, ds_sc)
            dz_sc = jnp.where(accept, c_dz_sc, dz_sc)
            alpha = jnp.where(accept, alpha_c, alpha)

        ds = v_W(scaling, ds_sc)

        step_finite = (
            jnp.isfinite(alpha) & (alpha > 0)
            & jnp.isfinite(psum(jnp.sum(dx * dx)))
            & jnp.isfinite(psum(jnp.sum(ds * ds)))
        )
        stalled = quality > cfg.solve_quality_tol
        numerr = ~step_finite | ~jnp.isfinite(gap) | stalled

        new_status = jnp.where(
            converged, Status.OPTIMAL,
            jnp.where(
                pinf, Status.PRIMAL_INFEASIBLE,
                jnp.where(
                    dinf, Status.DUAL_INFEASIBLE,
                    jnp.where(numerr, Status.NUMERICAL_ERROR, Status.RUNNING),
                ),
            ),
        ).astype(jnp.int32)
        done_now = new_status != Status.RUNNING
        freeze = st.done | done_now

        if cfg.verbose:
            jax.debug.print(
                "{k:3d} pcost={pc:+.6e} gap={g:.3e} pres={pr:.3e} "
                "dres={dr:.3e} step={a:.3f}",
                k=st.k, pc=pcost, g=gap, pr=pres, dr=dres, a=alpha,
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

        return BlockState(
            x=upd(x, dx), y=upd(y, dy), s=upd(s, ds), z=upd(z, dz),
            k=jnp.where(freeze, st.k, st.k + 1),
            status=jnp.where(st.done, st.status, new_status),
            done=freeze,
            best_merit=best_merit, bx=bx, by=by, bs=bs, bz_=bz_,
            hist=hist,
        )

    st = lax.while_loop(
        lambda st: (~st.done) & (st.k < cfg.max_iter), body, st0
    )
    status = jnp.where(st.done, st.status, Status.MAX_ITERATIONS).astype(
        jnp.int32
    )
    # best-iterate restoration + relaxed (inaccurate) acceptance on a
    # non-optimal, non-certificate exit — mirror of ipm/driver.py
    restore = (status == Status.NUMERICAL_ERROR) | (
        status == Status.MAX_ITERATIONS
    )

    # Relaxed exit certificates on the FINAL iterate (mirror of
    # ipm/driver.py): the stall guard can fire before the strict in-loop
    # certificate threshold; the final iterate has the strongest ray.
    rxf, ryf, rzf = residuals(st.x, st.y, st.s, st.z)
    hz_by_f = psum(jnp.sum(h * st.z)) + st.y @ b
    pvec_f = rxf - c
    if has_P:
        pvec_f = pvec_f - jnp.einsum("kij,kj->ki", Pq, st.x)
    pinf_exit = restore & (hz_by_f < 0) & (
        gnorm(jnp.sum(pvec_f * pvec_f)) <= cfg.feastol_inacc * -hz_by_f
    )
    cx_f = psum(jnp.sum(c * st.x))
    gx_s_f = rzf + h
    dres_cert = jnp.maximum(
        jnp.linalg.norm(ryf + b), gnorm(jnp.sum(gx_s_f * gx_s_f))
    )
    dinf_exit = restore & (cx_f < 0) & (dres_cert <= cfg.feastol_inacc * -cx_f)

    x = jnp.where(restore, st.bx, st.x)
    y = jnp.where(restore, st.by, st.y)
    s = jnp.where(restore, st.bs, st.s)
    z = jnp.where(restore, st.bz_, st.z)

    rx, ry, rz = residuals(x, y, s, z)
    gap = psum(jnp.sum(s * z))
    pcost = psum(jnp.sum(c * x)) + quad(x)
    dcost = pcost + y @ ry + psum(jnp.sum(z * rz)) - gap
    relgap = jnp.where(
        pcost < 0, gap / -pcost,
        jnp.where(dcost > 0, gap / dcost, jnp.inf),
    )
    pres = jnp.maximum(
        jnp.linalg.norm(ry) / norm_b, gnorm(jnp.sum(rz * rz)) / norm_h
    )
    dres = gnorm(jnp.sum(rx * rx)) / norm_c
    inacc_ok = (
        (pres <= cfg.feastol_inacc)
        & (dres <= cfg.feastol_inacc)
        & ((gap <= cfg.abstol_inacc) | (relgap <= cfg.reltol_inacc))
    )
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
    # driver-parity stats layout (api.py Solution order)
    stats = jnp.stack([pcost, dcost, gap, relgap, pres, dres,
                       inaccurate.astype(pcost.dtype)])
    return x, y, s, z, status, st.k, stats, st.hist


@functools.lru_cache(maxsize=64)
def _compiled_block(layout: ConeLayout, cfg: SolverConfig, mesh: Mesh,
                    axis: str, has_P: bool):
    fn = functools.partial(_core, layout, cfg, axis, int(mesh.devices.size),
                           has_P)
    blk = P(axis)
    rep = P()
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(blk, blk, blk, blk, rep, blk if has_P else rep),
        out_specs=(blk, rep, blk, blk, rep, rep, rep, rep),
        # collectives are elided on a 1-device mesh (see _core), which the
        # varying-axes type check would reject; the ring path satisfies the
        # check via an explicit pbroadcast (collectives.ring_allreduce)
        check_vma=mesh.devices.size > 1,
    )
    return jax.jit(mapped)


def solve_block(
    prob: BlockSocpProblem,
    mesh: Optional[Mesh] = None,
    config: SolverConfig = DEFAULT_CONFIG,
    dtype=None,
):
    """Solve a block SOCP with the Schur-distributed KKT over `mesh`.

    Returns (x (K,nb), y (p,), s, z in original block cone order, status,
    iterations, stats) with stats in the driver-parity layout
    [pcost, dcost, gap, relgap, pres, dres, inaccurate_flag].  With
    config.collect_history the per-iteration table is appended as an 8th
    element (k, 6 array: pcost, dcost, gap, pres, dres, step).
    """
    from socp_tpu.api import default_dtype
    from socp_tpu.parallel.mesh import block_mesh

    mesh = mesh or block_mesh()
    (axis,) = mesh.axis_names
    ndev = mesh.devices.size
    K = prob.n_blocks
    if K % ndev != 0:
        raise ValueError(f"blocks {K} not divisible by mesh size {ndev}")
    dtype = dtype or default_dtype()
    if config.gondzio_correctors is None:
        # same auto rule as api._resolve_pallas: the per-block factor +
        # Schur assembly dominates a TPU iteration, so one extra back-solve
        # per corrector is cheap; CPU runs stay corrector-free by default
        config = dataclasses.replace(
            config,
            gondzio_correctors=1 if jax.default_backend() == "tpu" else 0,
        )

    layout = make_layout(prob.block_dims, config.bucket_multiple)
    has_P = prob.P is not None

    def put(arr, spec):
        return jax.device_put(jnp.asarray(arr, dtype), NamedSharding(mesh, spec))

    cD = put(prob.c, P(axis))
    GD = put(layout.pad_rows(prob.G), P(axis))
    hD = put(layout.pad_vec(prob.h), P(axis))
    AD = put(prob.A, P(axis))
    bD = put(prob.b, P())
    PD = put(prob.P if has_P else np.zeros((1,)), P(axis) if has_P else P())

    fn = _compiled_block(layout, config, mesh, axis, has_P)
    x, y, s, z, status, k, stats, hist = fn(cD, GD, hD, AD, bD, PD)
    s = layout.unpad_vec(np.asarray(s, np.float64))
    z = layout.unpad_vec(np.asarray(z, np.float64))
    out = (
        np.asarray(x, np.float64), np.asarray(y, np.float64), s, z,
        Status(int(status)), int(k), np.asarray(stats, np.float64),
    )
    if config.collect_history:
        out = out + (np.asarray(hist, np.float64)[: int(k)],)
    return out


def random_block_problem(seed: int, K: int = 16, nb: int = 8,
                         block_dims: Optional[ConeDims] = None,
                         p: int = 4) -> tuple[BlockSocpProblem, float]:
    """KKT-constructed block problem with known optimal value (the block
    analog of models.random_socp)."""
    from socp_tpu.models.random_socp import _complementary_pair

    rng = np.random.default_rng(seed)
    if block_dims is None:
        block_dims = ConeDims(l=4, qs=(4, 6))
    mb = block_dims.dim
    assert mb >= nb, "need rank(G_i) = nb per block"
    xs = rng.normal(size=(K, nb))
    ys = rng.normal(size=p)
    s = np.empty((K, mb))
    z = np.empty((K, mb))
    for i in range(K):
        s[i], z[i] = _complementary_pair(rng, block_dims)
    A = rng.normal(size=(K, p, nb)) / np.sqrt(K * nb)
    G = rng.normal(size=(K, mb, nb)) / np.sqrt(nb)
    b = np.einsum("kpn,kn->p", A, xs)
    h = np.einsum("kmn,kn->km", G, xs) + s
    c = -(np.einsum("kpn,p->kn", A, ys) + np.einsum("kmn,km->kn", G, z))
    pcost = float(np.sum(c * xs))
    return BlockSocpProblem(c=c, G=G, h=h, block_dims=block_dims, A=A, b=b), pcost


def dryrun(mesh: Mesh) -> None:
    """One tiny block-Schur solve over `mesh` (used by dryrun_multichip)."""
    ndev = mesh.devices.size
    prob, _ = random_block_problem(0, K=2 * ndev, nb=6, p=3)
    cfg = SolverConfig(max_iter=4, refine_steps=0)
    x, y, s, z, status, k, stats = solve_block(prob, mesh=mesh, config=cfg)
    assert np.all(np.isfinite(x))
