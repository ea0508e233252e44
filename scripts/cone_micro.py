"""Microbenchmark of the dd cone-op layer at the lockstep batched shape.

Measures each primitive of the per-iteration cone sweep (scan-differenced,
device-resident) and compares dd reduction strategies:
  - dd_dot (pairwise contiguous halving, the shipping implementation)
  - f64-emulated dot (convert + multiply + sum in one XLA reduction)
so the choice is made on measured numbers, not guesses.
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
    ap.add_argument("--K", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from socp_tpu.cones import dd_ops
    from socp_tpu.cones.layout import make_layout
    from socp_tpu.models.robust_ls import robust_ls_batch
    from socp_tpu.ops import dd as ddm

    B = args.batch
    c, G, h, dims = robust_ls_batch(0, batch=B, n=args.n)
    layout = make_layout(dims, 8)
    m = layout.m_pad
    print(f"B={B} m_pad={m}", file=sys.stderr)

    rng = np.random.default_rng(0)
    e_np = np.zeros(m)
    e_np[: layout.l] = 1.0
    for b in layout.buckets:
        e_np[b.offset : b.offset + b.size : b.q_pad] = 1.0
    s_np = np.tile(e_np, (B, 1)) * rng.uniform(1.0, 1.5, (B, m))
    z_np = np.tile(e_np, (B, 1)) * rng.uniform(1.0, 1.5, (B, m))
    s = ddm.from_f64(jnp.asarray(s_np))
    z = ddm.from_f64(jnp.asarray(z_np))

    def timed(fn, x, K, reps=3):
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

    def mix(a, b_, w=1e-6):
        return ddm.add(ddm.mul_f32(a, jnp.float32(1.0 - w)),
                       ddm.mul_f32(b_, jnp.float32(w)))

    scaling = jax.jit(jax.vmap(
        lambda s_, z_: dd_ops.nt_scale(layout, s_, z_)))(s, z)
    lam = scaling.lam

    ops = {
        "jprod": lambda u: jax.vmap(
            lambda l_, u_: dd_ops.jprod(layout, l_, u_))(lam, u),
        "jdiv": lambda u: jax.vmap(
            lambda l_, u_: dd_ops.jdiv(layout, l_, u_))(lam, u),
        "apply_W": lambda u: jax.vmap(
            lambda sc, u_: dd_ops.apply_W(layout, sc, u_))(scaling, u),
        "apply_W2": lambda u: jax.vmap(
            lambda sc, u_: dd_ops.apply_W2(layout, sc, u_))(scaling, u),
        "nt_scale(lam)": lambda u: jax.vmap(
            lambda s_, u_: dd_ops.nt_scale(layout, s_, u_).lam)(s, u),
    }
    for name, op in ops.items():
        f = lambda u, op=op: mix(u, op(u), 1e-9)
        print(f"{name:16s} {marginal(f, s):8.3f} ms")

    def f_maxstep(u):
        a1 = jax.vmap(lambda l_, u_: dd_ops.max_step(layout, l_, u_))(lam, u)
        pert = ddm.from_f32(a1[:, None] * jnp.float32(1e-12))
        return ddm.add(u, pert)

    print(f"{'max_step':16s} {marginal(f_maxstep, s):8.3f} ms")

    # dot variants: full-vector dd dot (B,) out
    def f_dddot(u):
        d = dd_ops.dd_dot(u, z, axis=1)
        pert = DD = ddm.from_f32(d.hi[:, None] * jnp.float32(1e-12))
        return ddm.add(u, pert)

    print(f"{'dd_dot pairwise':16s} {marginal(f_dddot, s):8.3f} ms")

    def f_f64dot(u):
        u64 = u.hi.astype(jnp.float64) + u.lo.astype(jnp.float64)
        z64 = z.hi.astype(jnp.float64) + z.lo.astype(jnp.float64)
        d = jnp.sum(u64 * z64, axis=1)
        pert = ddm.from_f32(d.astype(jnp.float32)[:, None]
                            * jnp.float32(1e-12))
        return ddm.add(u, pert)

    print(f"{'f64 dot':16s} {marginal(f_f64dot, s):8.3f} ms")

    # elementwise dd baselines
    def f_mul(u):
        return mix(u, ddm.mul(u, z), 1e-9)

    print(f"{'dd mul (elem)':16s} {marginal(f_mul, s):8.3f} ms")

    def f_div(u):
        return mix(u, ddm.div(u, z), 1e-9)

    print(f"{'dd div (elem)':16s} {marginal(f_div, s):8.3f} ms")


if __name__ == "__main__":
    main()
