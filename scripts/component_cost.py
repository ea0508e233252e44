"""Intra-jit component costs via lax.scan differencing.

The axon tunnel adds ~30 ms per dispatch, so honest component timing must
happen INSIDE one jitted program: run a component K1 vs K2 times in a scan
(carry-dependent, so XLA can't elide), difference, divide.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from socp_tpu.cones import ops as cops
    from socp_tpu.cones.layout import make_layout
    from socp_tpu.kkt import dd_dense
    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops.dd_linalg import dd_chol_solve, dd_cholesky
    from socp_tpu.ops.ozaki import dd_matmul

    B = args.batch
    c, G, h, dims = robust_ls_batch(0, batch=B, n=args.n)
    n = c.shape[1]
    layout = make_layout(dims, 8)
    m = layout.m_pad
    print(f"B={B} n={n} m_pad={m}", file=sys.stderr)

    rng = np.random.default_rng(0)
    Gp = jnp.asarray(layout.pad_rows(G), jnp.float64)
    s0 = np.asarray(
        jnp.concatenate(
            [jnp.ones(layout.l), cops.identity(layout)[layout.l:]]
        )
    )
    s = jnp.asarray(np.tile(s0, (B, 1)) * rng.uniform(1.0, 1.5, (B, m)))
    z = jnp.asarray(np.tile(s0, (B, 1)) * rng.uniform(1.0, 1.5, (B, m)))
    v0 = jnp.asarray(rng.standard_normal((B, n)))

    def timed(fn, x, K, reps=2):
        """fn: carry -> carry; returns ms per application."""
        def scanned(x):
            def step(carry, _):
                return fn(carry), None
            out, _ = lax.scan(step, x, None, length=K)
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

    def marginal(fn, x, K1=2, K2=6):
        return (timed(fn, x, K2) - timed(fn, x, K1)) / (K2 - K1)

    scale_b = jax.vmap(lambda s_, z_: cops.nt_scale(layout, s_, z_))
    scaling = scale_b(s, z)

    # 1. nt_scale: carry s -> jiggle, rescale (keep shape/interior)
    def f_scale(s_):
        sc = scale_b(s_, z)
        return s_ * 0.999 + 0.001 * sc.lam

    print(f"nt_scale+mix        {marginal(f_scale, s):8.2f} ms")

    # 2. full dd factor (carry: s fed into scaling via mix)
    fact_b = jax.vmap(
        lambda sc, G_: dd_dense.factor(layout, sc, None,
                                       jnp.zeros((0, n)), G_, 1e-11),
        in_axes=(0, 0),
    )

    def f_factor(s_):
        sc = scale_b(s_, z)
        kkt = fact_b(sc, Gp)
        return s_ + 1e-9 * kkt.L_H.L.hi[:, 0, 0, None].astype(jnp.float64)

    print(f"nt_scale+factor     {marginal(f_factor, s):8.2f} ms")

    # 3. dd back-solve alone (fixed kkt, carry rhs)
    kkt = jax.jit(lambda s_, z_: fact_b(scale_b(s_, z_), Gp))(s, z)
    solve_b = jax.vmap(
        lambda k, bx_, bz_: dd_dense.solve(
            layout, k, jnp.zeros((0, n)), bx_, jnp.zeros((0,)), bz_
        ),
        in_axes=(0, 0, 0),
    )

    def f_solve(v):
        dx, dy, dz = solve_b(kkt, v, jnp.zeros((B, m)))
        return v * 0.5 + 0.5 * dx

    print(f"dd back-solve       {marginal(f_solve, v0):8.2f} ms")

    # 4. f64 GEMV pair (residual-style: G.T @ z then G @ x)
    def f_gemv(v):
        gz = jnp.einsum("bmn,bm->bn", Gp, jnp.einsum("bmn,bn->bm", Gp, v))
        return v * 0.5 + 1e-6 * gz

    print(f"f64 GEMV x2         {marginal(f_gemv, v0):8.2f} ms")

    def f_gemv32(v):
        G32 = Gp.astype(jnp.float32)
        v32 = v.astype(jnp.float32)
        gz = jnp.einsum("bmn,bm->bn", G32,
                        jnp.einsum("bmn,bn->bm", G32, v32))
        return v * 0.5 + 1e-6 * gz.astype(jnp.float64)

    print(f"f32 GEMV x2         {marginal(f_gemv32, v0):8.2f} ms")

    # 5. Ozaki Gram alone (carry perturbs Ghat)
    Ghat64 = jax.jit(
        jax.vmap(lambda sc, G_: cops.scale_rows_Winv(layout, sc, G_))
    )(scaling, Gp)

    def f_gram(Gh):
        H = jax.vmap(lambda g: dd_matmul(ddm.from_f64(g).T, ddm.from_f64(g)))(Gh)
        return Gh + 1e-12 * H.hi[:, :1, :].astype(jnp.float64)[:, 0, None, :]

    print(f"Ozaki Gram          {marginal(f_gram, Ghat64, K1=1, K2=3):8.2f} ms")

    # 6. dd cholesky alone
    H0 = jax.jit(
        jax.vmap(lambda g: dd_matmul(ddm.from_f64(g).T, ddm.from_f64(g)))
    )(Ghat64)
    eyeB = jnp.eye(n)[None] * 1e-3

    def f_chol(Hd):
        L = jax.vmap(dd_cholesky)(Hd)
        return ddm.DD(Hd.hi + 1e-30 * L.hi, Hd.lo)

    print(f"dd Cholesky         {marginal(f_chol, H0, K1=1, K2=3):8.2f} ms")

    # 7. dd triangular pair
    L0 = jax.jit(jax.vmap(dd_cholesky))(H0)
    r0 = ddm.from_f64(v0[..., None])

    def f_tri(r):
        x_ = jax.vmap(dd_chol_solve)(L0, r)
        return ddm.DD(r.hi * 0.5 + 0.5 * x_.hi, r.lo * 0.5 + 0.5 * x_.lo)

    print(f"dd tri fwd+back     {marginal(f_tri, r0):8.2f} ms")

    # 8. cone sweep (jprod + apply_W + max_step), f64
    cone_b = jax.vmap(
        lambda sc, u: cops.apply_W(
            layout, sc, cops.jprod(layout, u, u)
        )
    )

    def f_cone(u):
        w = cone_b(scaling, u)
        st = jax.vmap(lambda a, b_: cops.max_step(layout, a, b_))(u, w)
        return u * 0.999 + 1e-6 * w + 1e-9 * st[:, None]

    print(f"cone sweep (f64)    {marginal(f_cone, s):8.2f} ms")


if __name__ == "__main__":
    main()
