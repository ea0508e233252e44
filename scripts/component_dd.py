"""Intra-jit component costs of the dd-native IPM path (lax.scan differencing).

Accounts for the dd32 driver's per-iteration budget: dd NT scaling, dd KKT
factor (Gram + blocked Cholesky + Schur), dd back-solve, residual matvecs
on presliced constants, and the dd cone-op sweep.
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
    ap.add_argument("--invert", type=int, default=1,
                    help="1: apply the factor via the explicit triangular "
                         "inverse (DDEqCholInv); 0: substitution")
    ap.add_argument("--K", type=int, default=6,
                    help="scan length for the long leg of the marginal "
                         "(K - 2 passes of margin; raise until the margin "
                         "dwarfs the ~30 ms tunnel jitter)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from socp_tpu.cones import dd_ops
    from socp_tpu.cones.layout import make_layout
    from socp_tpu.kkt import dd_dense
    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops.ozaki import preslice

    B = args.batch
    c, G, h, dims = robust_ls_batch(0, batch=B, n=args.n)
    n = c.shape[1]
    layout = make_layout(dims, 8)
    m = layout.m_pad
    print(f"B={B} n={n} m_pad={m}", file=sys.stderr)

    rng = np.random.default_rng(0)
    Gp64 = jnp.asarray(layout.pad_rows(G), jnp.float64)
    Gdd = ddm.from_f64(Gp64)

    e_np = np.zeros(m)
    e_np[: layout.l] = 1.0
    for b in layout.buckets:
        e_np[b.offset : b.offset + b.size : b.q_pad] = 1.0
    s_np = np.tile(e_np, (B, 1)) * rng.uniform(1.0, 1.5, (B, m))
    z_np = np.tile(e_np, (B, 1)) * rng.uniform(1.0, 1.5, (B, m))
    s = ddm.from_f64(jnp.asarray(s_np))
    z = ddm.from_f64(jnp.asarray(z_np))
    v0 = ddm.from_f64(jnp.asarray(rng.standard_normal((B, n))))
    w0 = ddm.from_f64(jnp.asarray(rng.standard_normal((B, m))))

    def timed(fn, x, K, reps=2):
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

    def marginal(fn, x, K1=2, K2=None):
        K2 = args.K if K2 is None else K2
        return (timed(fn, x, K2) - timed(fn, x, K1)) / (K2 - K1)

    def mix(a: ddm.DD, b_: ddm.DD, w=1e-6):
        return ddm.add(ddm.mul_f32(a, jnp.float32(1.0 - w)),
                       ddm.mul_f32(b_, jnp.float32(w)))

    scale_b = jax.vmap(lambda s_, z_: dd_ops.nt_scale(layout, s_, z_))

    # 1. dd nt_scale
    def f_scale(s_):
        sc = scale_b(s_, z)
        return mix(s_, sc.lam)

    print(f"dd nt_scale         {marginal(f_scale, s):8.2f} ms")

    scaling = jax.jit(scale_b)(s, z)
    A0 = ddm.from_f32(jnp.zeros((0, n), jnp.float32))

    # constant preslices (outside the timed loop, like the shipping driver)
    GT_s = jax.jit(jax.vmap(lambda g: preslice(g.T)))(Gdd)
    G_s = jax.jit(jax.vmap(preslice))(Gdd)
    fact_b = jax.vmap(
        lambda sc, G_, gts, gs: dd_dense.factor_dd(
            layout, sc, None, A0, G_, 1e-11, GT_s=gts, G_s=gs,
            invert=bool(args.invert)),
        in_axes=(0, 0, 0, 0),
    )

    def _probe(kkt):
        # tiny dd leaf of the factor, any variant (feeds the scan carry)
        lh = kkt.L_H
        leaf = lh.Linv_s.S if hasattr(lh, "Linv_s") else lh.L.hi
        return ddm.DD(leaf.reshape(leaf.shape[0], -1)[:, 0, None].astype(jnp.float32),
                      jnp.zeros((leaf.shape[0], 1), jnp.float32))

    # 2. nt_scale + full dd factor
    def f_factor(s_):
        sc = scale_b(s_, z)
        kkt = fact_b(sc, Gdd, GT_s, G_s)
        return ddm.add(s_, ddm.mul_f32(_probe(kkt), jnp.float32(1e-12)))

    print(f"dd nt_scale+factor  {marginal(f_factor, s):8.2f} ms")

    kkt = jax.jit(
        lambda s_, z_: fact_b(scale_b(s_, z_), Gdd, GT_s, G_s)
    )(s, z)

    # 3. dd back-solve (solve_dd)
    solve_b = jax.vmap(
        lambda k, bx_, bz_: dd_dense.solve_dd(
            layout, k, A0, bx_,
            ddm.from_f32(jnp.zeros((0,), jnp.float32)), bz_
        ),
        in_axes=(0, 0, 0),
    )

    def f_solve(v):
        dx, dy, dz = solve_b(kkt, v, w0)
        return mix(v, dx, 0.5)

    print(f"dd back-solve       {marginal(f_solve, v0):8.2f} ms")

    # 4. residual matvecs on presliced constants (GT_s z, G_s x)
    GT_s = jax.vmap(lambda g: preslice(g.T))(Gdd)
    G_s = jax.vmap(preslice)(Gdd)
    mv = jax.vmap(dd_dense.sliced_matvec)

    def f_resid(v):
        gz = mv(GT_s, w0)
        gx = mv(G_s, mix(v, gz, 1e-9))
        return mix(v, mv(GT_s, gx), 1e-9)

    print(f"dd resid matvec x3  {marginal(f_resid, v0):8.2f} ms")

    # 5. dd cone sweep: jprod + jdiv + apply_W + 2x max_step
    def f_cone(u):
        lam = scaling.lam
        a = jax.vmap(lambda l_, u_: dd_ops.jprod(layout, l_, u_))(lam, u)
        d = jax.vmap(lambda l_, a_: dd_ops.jdiv(layout, l_, a_))(lam, a)
        w = jax.vmap(lambda sc, d_: dd_ops.apply_W(layout, sc, d_))(scaling, d)
        st1 = jax.vmap(lambda l_, w_: dd_ops.max_step(layout, l_, w_))(lam, w)
        st2 = jax.vmap(lambda l_, w_: dd_ops.max_step(layout, l_, w_))(lam, a)
        pert = ddm.from_f32((st1 + st2)[:, None] * jnp.float32(1e-12))
        return ddm.add(mix(u, w, 1e-9), pert)

    print(f"dd cone sweep       {marginal(f_cone, s):8.2f} ms")


if __name__ == "__main__":
    main()
