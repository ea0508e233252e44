"""Phase-level cost of the batched dd KKT factor at the c3 contract chunk.

Times, via lax.scan differencing at (B, n, m) = (128, 102, 312):
  assembly   — nt_scale + structured H assembly (Ozaki Gram + rank corr)
  chol_xla   — dd_cholesky_blocked
  chol_pl    — instance-tiled Pallas dd Cholesky
  triinv     — dd_tri_inv + preslice(Linv) + preslice(LinvT)
  sub_solve  — substitution back-solve (DDEqChol, k=1)
  inv_solve  — inverse-apply back-solve (DDEqCholInv, k=1)
  pl_solve   — instance-tiled Pallas tri-pair back-solve (k=1)

Usage: python scripts/factor_phases.py [--batch 128] [--n 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--K", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)

    from socp_tpu.cones import dd_ops
    from socp_tpu.cones.layout import make_layout
    from socp_tpu.kkt import dd_dense
    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops.dd import DD
    from socp_tpu.ops.dd_linalg import (dd_cholesky_blocked, dd_tri_inv)
    from socp_tpu.ops import pallas_chol as plc
    from socp_tpu.ops.ozaki import preslice, sliced_matmul

    B = args.batch
    c, G, h, dims = robust_ls_batch(0, batch=B, n=args.n)
    n = c.shape[1]
    layout = make_layout(dims, 8)
    m = layout.m_pad
    print(f"B={B} n={n} m_pad={m}", file=sys.stderr)

    rng = np.random.default_rng(0)
    Gdd = ddm.from_f64(jnp.asarray(layout.pad_rows(G), jnp.float64))

    e_np = np.zeros(m)
    e_np[: layout.l] = 1.0
    for bk in layout.buckets:
        e_np[bk.offset : bk.offset + bk.size : bk.q_pad] = 1.0
    s = ddm.from_f64(jnp.asarray(
        np.tile(e_np, (B, 1)) * rng.uniform(1.0, 1.5, (B, m))))
    z = ddm.from_f64(jnp.asarray(
        np.tile(e_np, (B, 1)) * rng.uniform(1.0, 1.5, (B, m))))
    v0 = ddm.from_f64(jnp.asarray(rng.standard_normal((B, n))))

    def bT(M: DD) -> DD:
        """Transpose the matrix dims of a batched (B, n, n) DD."""
        return DD(jnp.swapaxes(M.hi, -1, -2), jnp.swapaxes(M.lo, -1, -2))

    def timed(fn, x, K, reps=2):
        def scanned(x):
            out, _ = lax.scan(lambda c_, _: (fn(c_), None), x, None, length=K)
            return out
        f = jax.jit(scanned)
        out = f(x)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(x)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, time.time() - t0)
        return best * 1e3

    def marginal(fn, x, K1=2, K2=None):
        K2 = args.K if K2 is None else K2
        return (timed(fn, x, K2) - timed(fn, x, K1)) / (K2 - K1)

    def mix(a: DD, b_: DD, w=1e-6):
        return ddm.add(ddm.mul_f32(a, jnp.float32(1.0 - w)),
                       ddm.mul_f32(b_, jnp.float32(w)))

    scale_b = jax.vmap(lambda s_, z_: dd_ops.nt_scale(layout, s_, z_))
    GT_s = jax.jit(jax.vmap(lambda g: preslice(g.T)))(Gdd)

    # ---- assembly only (structured H, no chol)
    def asm_one(sc, g, gts):
        rho = dd_ops.winv2_rho(layout, sc)
        Mrho = ddm.mul(g, DD(rho.hi[:, None], rho.lo[:, None]))
        H = sliced_matmul(gts, Mrho)
        V, w2 = dd_ops.winv2_columns(layout, sc)
        U = sliced_matmul(gts, V)
        Uw = ddm.mul(U, DD(w2.hi[None, :], w2.lo[None, :]))
        from socp_tpu.ops.ozaki import dd_matmul
        return ddm.add(H, dd_matmul(Uw, U.T))

    asm_b = jax.vmap(asm_one, in_axes=(0, 0, 0))

    def f_asm(s_):
        sc = scale_b(s_, z)
        H = asm_b(sc, Gdd, GT_s)
        return ddm.add(s_, ddm.mul_f32(
            DD(H.hi[:, 0, 0, None] + jnp.zeros((B, m), jnp.float32),
               H.lo[:, 0, 0, None] + jnp.zeros((B, m), jnp.float32)),
            jnp.float32(1e-12)))

    print(f"assembly (nt+H)     {marginal(f_asm, s):8.2f} ms", flush=True)

    scaling = jax.jit(scale_b)(s, z)
    H0 = jax.jit(lambda s_, z_: asm_b(scale_b(s_, z_), Gdd, GT_s))(s, z)
    # make it well-conditioned SPD for repeated chol
    eyeB = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (B, n, n))
    H0 = ddm.add(H0, ddm.from_f32(0.1 * eyeB))

    def probe_mat(L: DD, x_like: DD) -> DD:
        # sum over EVERYTHING: a single-element probe lets XLA dead-code
        # the rest of the op under test (observed: chol panels 2..4 DCE'd)
        r = jnp.sum(L.hi, axis=(-1, -2)) + jnp.sum(L.lo, axis=(-1, -2))
        return ddm.add(x_like, ddm.mul_f32(
            DD(r[:, None] + jnp.zeros_like(x_like.hi),
               jnp.zeros_like(x_like.hi)), jnp.float32(1e-12)))

    # ---- chol XLA blocked
    chol_b = jax.vmap(dd_cholesky_blocked)

    def f_chol(x):
        # x is (B, n) dd rider; perturb H0 diag by x to keep a data dep
        Hp = DD(H0.hi + 1e-20 * x.hi[:, :, None] * eyeB,
                H0.lo)
        L = chol_b(Hp)
        return probe_mat(L, x)

    print(f"chol_xla (blocked)  {marginal(f_chol, v0):8.2f} ms", flush=True)

    # ---- chol Pallas instance-tiled
    def f_chol_pl(x):
        Hp = DD(H0.hi + 1e-20 * x.hi[:, :, None] * eyeB, H0.lo)
        L = plc.cholesky_dd_batched(Hp)
        return probe_mat(L, x)

    print(f"chol_pallas         {marginal(f_chol_pl, v0):8.2f} ms", flush=True)

    L0 = jax.jit(chol_b)(H0)

    # ---- tri_inv + preslices
    def f_triinv(x):
        Lp = DD(L0.hi + 1e-20 * x.hi[:, :, None] * eyeB, L0.lo)
        Linv = jax.vmap(dd_tri_inv)(Lp)
        Li_s = jax.vmap(preslice)(Linv)
        LiT_s = jax.vmap(preslice)(bT(Linv))
        r = (jnp.sum(Li_s.S.astype(jnp.float32), axis=(1, 2, 3))
             + jnp.sum(LiT_s.S.astype(jnp.float32), axis=(1, 2, 3)))
        return ddm.add(x, ddm.mul_f32(
            DD(r[:, None] + jnp.zeros((B, n), jnp.float32),
               jnp.zeros((B, n), jnp.float32)), jnp.float32(1e-12)))

    print(f"triinv+preslice     {marginal(f_triinv, v0):8.2f} ms", flush=True)

    # ---- substitution solve (k=1)
    from socp_tpu.ops.dd_linalg import dd_chol_solve

    def f_sub(x):
        y = jax.vmap(lambda L_, LT_, b_: dd_chol_solve(
            L_, DD(b_.hi[:, None], b_.lo[:, None]), LT=LT_))(L0, bT(L0), x)
        return mix(x, DD(y.hi[:, :, 0], y.lo[:, :, 0]), 0.5)

    print(f"sub_solve (k=1)     {marginal(f_sub, v0):8.2f} ms", flush=True)

    # ---- inverse-apply solve
    Linv0 = jax.jit(jax.vmap(dd_tri_inv))(L0)
    Li_s0 = jax.jit(jax.vmap(preslice))(Linv0)
    LiT_s0 = jax.jit(jax.vmap(preslice))(bT(Linv0))

    def f_inv(x):
        def one(ls, lts, b_):
            y = sliced_matmul(ls, DD(b_.hi[:, None], b_.lo[:, None]))
            w = sliced_matmul(lts, y)
            return DD(w.hi[:, 0], w.lo[:, 0])
        y = jax.vmap(one)(Li_s0, LiT_s0, x)
        return mix(x, y, 0.5)

    print(f"inv_solve (k=1)     {marginal(f_inv, v0):8.2f} ms", flush=True)

    # ---- Pallas tri-pair solve
    def f_pl(x):
        y = jax.vmap(lambda L_, LT_, b_: plc.tri_pair_solve_v(
            L_, LT_, DD(b_.hi[:, None], b_.lo[:, None])))(L0, bT(L0), x)
        return mix(x, DD(y.hi[:, :, 0], y.lo[:, :, 0]), 0.5)

    print(f"pl_solve (k=1)      {marginal(f_pl, v0):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
