"""Compiled Pallas kernels vs the XLA-compiled dd_linalg path, on TPU.

Times with lax.scan differencing (the axon tunnel adds ~30 ms/dispatch and
block_until_ready lies — see scripts/component_cost.py).

Run:  python scripts/pallas_bench.py [--sizes 128,512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_socp")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="128,512")
    ap.add_argument("--x64", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops import pallas_chol as pc
    from socp_tpu.ops.dd_linalg import (dd_chol_solve, dd_cholesky_blocked)

    print("backend:", jax.default_backend(), file=sys.stderr)

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

    def marginal(fn, x, K1=1, K2=3):
        return (timed(fn, x, K2) - timed(fn, x, K1)) / (K2 - K1)

    for n in [int(s) for s in args.sizes.split(",")]:
        rng = np.random.default_rng(0)
        A = rng.normal(size=(n, n))
        H64 = A @ A.T + n * np.eye(n)
        Hdd = ddm.from_f64(jnp.asarray(H64))
        b64 = rng.normal(size=(n, 1))
        bdd = ddm.from_f64(jnp.asarray(b64))

        # --- accuracy first
        Lp = jax.jit(pc.cholesky_dd)(Hdd)
        Lx = jax.jit(dd_cholesky_blocked)(Hdd)
        dL = np.abs(np.asarray(Lp.astype_f64() - Lx.astype_f64())).max()
        xp = jax.jit(pc.tri_pair_solve)(Lx, ddm.DD(Lx.hi.T, Lx.lo.T), bdd)
        xr = np.linalg.solve(H64, b64)
        dx = np.abs(np.asarray(xp.astype_f64()) - xr).max() / np.abs(xr).max()

        Hf = jnp.asarray(H64, jnp.float32)
        Lf = jax.jit(pc.cholesky_f32)(Hf)
        dLf = np.abs(np.asarray(Lf, np.float64) @ np.asarray(Lf, np.float64).T
                     - H64).max() / np.abs(H64).max()
        xf = jax.jit(pc.tri_solve_f32)(Lf, Lf.T, jnp.asarray(b64, jnp.float32))
        dxf = np.abs(np.asarray(xf, np.float64) - xr).max() / np.abs(xr).max()
        print(f"n={n}: acc ddchol={dL:.2e} ddsolve={dx:.2e} "
              f"f32chol={dLf:.2e} f32solve={dxf:.2e}")

        # --- timing: dd cholesky
        def f_chol_xla(Hd):
            L = dd_cholesky_blocked(Hd)
            return ddm.DD(Hd.hi + 1e-30 * L.hi, Hd.lo)

        def f_chol_pal(Hd):
            L = pc.cholesky_dd(Hd)
            return ddm.DD(Hd.hi + 1e-30 * L.hi, Hd.lo)

        t_xla = marginal(f_chol_xla, Hdd)
        t_pal = marginal(f_chol_pal, Hdd)
        print(f"  dd chol    XLA {t_xla:8.2f} ms   pallas {t_pal:8.2f} ms")

        # --- timing: dd solve (fixed factor, carry rhs)
        LT = ddm.DD(Lx.hi.T, Lx.lo.T)

        def f_solve_xla(r):
            x_ = dd_chol_solve(Lx, r, LT=LT)
            return ddm.DD(r.hi * 0.5 + 0.5 * x_.hi, r.lo * 0.5 + 0.5 * x_.lo)

        def f_solve_pal(r):
            x_ = pc.tri_pair_solve(Lx, LT, r)
            return ddm.DD(r.hi * 0.5 + 0.5 * x_.hi, r.lo * 0.5 + 0.5 * x_.lo)

        t_xla = marginal(f_solve_xla, bdd, K1=2, K2=6)
        t_pal = marginal(f_solve_pal, bdd, K1=2, K2=6)
        print(f"  dd solve   XLA {t_xla:8.2f} ms   pallas {t_pal:8.2f} ms")

        # --- timing: f32 chol + solve
        def f_f32chol_xla(Hc):
            L = jnp.linalg.cholesky(Hc)
            return Hc + 1e-30 * L

        def f_f32chol_pal(Hc):
            L = pc.cholesky_f32(Hc)
            return Hc + 1e-30 * L

        t_xla = marginal(f_f32chol_xla, Hf)
        t_pal = marginal(f_f32chol_pal, Hf)
        print(f"  f32 chol   XLA {t_xla:8.2f} ms   pallas {t_pal:8.2f} ms")

        bf = jnp.asarray(b64, jnp.float32)

        def f_f32solve_xla(r):
            y = lax.linalg.triangular_solve(Lf, r, left_side=True, lower=True)
            x_ = lax.linalg.triangular_solve(Lf, y, left_side=True, lower=True,
                                             transpose_a=True)
            return r * 0.5 + 0.5 * x_

        def f_f32solve_pal(r):
            x_ = pc.tri_solve_f32(Lf, Lf.T, r)
            return r * 0.5 + 0.5 * x_

        t_xla = marginal(f_f32solve_xla, bf, K1=2, K2=6)
        t_pal = marginal(f_f32solve_pal, bf, K1=2, K2=6)
        print(f"  f32 solve  XLA {t_xla:8.2f} ms   pallas {t_pal:8.2f} ms")


if __name__ == "__main__":
    main()
