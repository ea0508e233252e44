"""Microbenchmark the dd-factor KKT pipeline components on the accelerator.

Times (batched, jitted, steady-state): Ozaki Gram GEMM, dd Cholesky,
dd triangular solves, full factor, full solve, cone ops — to locate the
per-iteration bottleneck driving the north-star "KKT factorize+solve ms".
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    # axon (tunneled TPU) block_until_ready returns early; a host transfer
    # of one scalar per leaf is the only reliable fence.
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and leaf.size:
            np.asarray(leaf.ravel()[0])


def bench(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.cones.layout import make_layout
    from socp_tpu.cones import ops as cops
    from socp_tpu.kkt import dense, dd_dense
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops.dd_linalg import dd_cholesky, dd_chol_solve
    from socp_tpu.ops.ozaki import dd_matmul

    B = args.batch
    c, G, h, dims = robust_ls_batch(0, batch=B, n=args.n)
    n = c.shape[1]
    layout = make_layout(dims, 8)
    m = layout.m_pad
    print(f"B={B} n={n} m_pad={m}", file=sys.stderr)

    rng = np.random.default_rng(0)
    Gp = jnp.asarray(layout.pad_rows(G), jnp.float64)
    s = jnp.asarray(rng.uniform(1.0, 2.0, (B, m)))
    z = jnp.asarray(rng.uniform(1.0, 2.0, (B, m)))
    # make s,z cone-interior: scale SOC tails down
    s = s.at[:, layout.l :].set(0.01 * s[:, layout.l :])
    z = z.at[:, layout.l :].set(0.01 * z[:, layout.l :])
    s = s.at[:, layout.l :: 8].set(5.0)
    z = z.at[:, layout.l :: 8].set(5.0)

    A = jnp.zeros((0, n), jnp.float64)
    bx = jnp.asarray(rng.standard_normal((B, n)))
    by = jnp.zeros((B, 0), jnp.float64)
    bz = jnp.asarray(rng.standard_normal((B, m)))

    scale_fn = jax.jit(jax.vmap(lambda s_, z_: cops.nt_scale(layout, s_, z_)))
    t_scale = bench(scale_fn, s, z)
    scaling = scale_fn(s, z)

    # component: W^-1 G row scaling
    rows_fn = jax.jit(
        jax.vmap(lambda sc, G_: cops.scale_rows_Winv(layout, sc, G_))
    )
    t_rows = bench(rows_fn, scaling, Gp)
    Ghat64 = rows_fn(scaling, Gp)
    Ghat = ddm.from_f64(Ghat64)

    # component: Ozaki Gram
    gram_fn = jax.jit(jax.vmap(lambda Gh: dd_matmul(Gh.T, Gh)))
    t_gram = bench(gram_fn, Ghat)
    H = gram_fn(Ghat)

    # component: dd Cholesky
    chol_fn = jax.jit(jax.vmap(dd_cholesky))
    t_chol = bench(chol_fn, H)
    L = chol_fn(H)

    # component: one dd triangular solve pair (fwd+back), 1 rhs
    rhs = ddm.from_f64(bx[..., None])
    tri_fn = jax.jit(jax.vmap(dd_chol_solve))
    t_tri = bench(tri_fn, L, rhs)

    # full factor (dd path)
    fact_fn = jax.jit(
        jax.vmap(
            lambda sc, G_: dd_dense.factor(layout, sc, None, A, G_, 1e-11)
        ),
        # A empty -> no batch axis issue
    )
    t_factor = bench(fact_fn, scaling, Gp)
    kkt = fact_fn(scaling, Gp)

    # full back-solve
    solve_fn = jax.jit(
        jax.vmap(
            lambda k, bx_, bz_: dd_dense.solve(
                layout, k, A, bx_, jnp.zeros((0,), jnp.float64), bz_
            )
        )
    )
    t_solve = bench(solve_fn, kkt, bx, bz)

    # cone ops sweep (jprod + apply_W + max_step)
    def cone_sweep(s_, z_, sc):
        lam = sc.lam
        a = cops.jprod(layout, lam, lam)
        b_ = cops.apply_W(layout, sc, a)
        st = cops.max_step(layout, lam, b_)
        return b_, st

    cone_fn = jax.jit(jax.vmap(lambda s_, z_, sc: cone_sweep(s_, z_, sc)))
    t_cone = bench(cone_fn, s, z, scaling)

    print(f"nt_scale        {t_scale:8.2f} ms")
    print(f"Winv rows (f64) {t_rows:8.2f} ms")
    print(f"Ozaki Gram      {t_gram:8.2f} ms")
    print(f"dd Cholesky     {t_chol:8.2f} ms")
    print(f"dd tri solve x2 {t_tri:8.2f} ms")
    print(f"factor (full)   {t_factor:8.2f} ms")
    print(f"solve  (full)   {t_solve:8.2f} ms")
    print(f"cone sweep      {t_cone:8.2f} ms")
    print(f"est iter = factor + 6x solve = "
          f"{t_factor + 6 * t_solve:8.2f} ms")


if __name__ == "__main__":
    main()
