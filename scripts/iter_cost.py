"""Marginal per-iteration cost of the real lockstep solve, by differencing
max_iter, with components toggled (refinement, f64 matvecs).

Also times a bare batched f64 GEMV vs its dd/Ozaki equivalent to quantify
TPU f64-emulation cost for the O(mn) residual work.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and leaf.size:
            np.asarray(leaf.ravel()[0])


def bench(fn, *args, reps=3):
    out = fn(*args)
    _sync(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    import functools

    from socp_tpu.config import SolverConfig
    from socp_tpu.cones.layout import make_layout
    from socp_tpu.ipm import driver
    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops.ozaki import preslice, sliced_matmul

    B = args.batch
    c, G, h, dims = robust_ls_batch(0, batch=B, n=args.n)
    n = c.shape[1]
    layout = make_layout(dims, 8)
    m = layout.m_pad
    print(f"B={B} n={n} m_pad={m}", file=sys.stderr)

    rng = np.random.default_rng(0)

    # --- bare f64 batched GEMV vs f32 vs Ozaki-sliced
    Gb64 = jnp.asarray(rng.standard_normal((B, m, n)))
    x64 = jnp.asarray(rng.standard_normal((B, n)))
    mv64 = jax.jit(lambda A_, v: jnp.einsum("bmn,bn->bm", A_, v))
    t64 = bench(mv64, Gb64, x64)
    Gb32 = Gb64.astype(jnp.float32)
    x32 = x64.astype(jnp.float32)
    t32 = bench(mv64, Gb32, x32)
    print(f"batched GEMV ({B}x{m}x{n}): f64 {t64:.2f} ms | f32 {t32:.2f} ms "
          f"| ratio {t64 / max(t32, 1e-9):.0f}x")

    # dd/Ozaki equivalent
    G_s = jax.vmap(lambda A_: preslice(ddm.from_f64(A_)))(Gb64)
    xdd = ddm.from_f64(x64[..., None])
    mvdd = jax.jit(jax.vmap(sliced_matmul))
    tdd = bench(mvdd, G_s, xdd)
    print(f"dd/Ozaki GEMV:            {tdd:.2f} ms")

    # --- marginal iteration cost of the real solve
    cD = jnp.asarray(c, jnp.float64)
    GD = jnp.asarray(layout.pad_rows(G), jnp.float64)
    hD = jnp.asarray(layout.pad_vec(h), jnp.float64)
    AD = jnp.zeros((0, n), jnp.float64)
    bD = jnp.zeros((0,), jnp.float64)
    PD = jnp.zeros((0, 0), jnp.float64)

    for label, kw in [
        ("dd-factor refine=1", dict(factor_dtype="dd32", refine_steps=1)),
        ("dd-factor refine=0", dict(factor_dtype="dd32", refine_steps=0)),
    ]:
        ts = {}
        for mi in (2, 6):
            cfg = SolverConfig(max_iter=mi, **kw)
            core = functools.partial(driver.solve_core.__wrapped__, layout,
                                     cfg, has_P=False)
            fn = jax.jit(jax.vmap(core, in_axes=(0, 0, 0, None, None, None)))
            ts[mi] = bench(fn, cD, GD, hD, AD, bD, PD, reps=2)
        per_it = (ts[6] - ts[2]) / 4
        print(f"{label}: max_iter2 {ts[2]:.0f} ms, max_iter6 {ts[6]:.0f} ms "
              f"-> {per_it:.1f} ms/iter")


if __name__ == "__main__":
    main()
