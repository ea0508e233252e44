"""Measure the attached chip's attainable peaks: HBM stream bandwidth,
VPU f32 throughput, MXU bf16 throughput.

These are the denominators for bench.py's `achieved_vs_attainable_pct` —
the north star asks for measured distance to speed-of-light, and vendor
peak numbers routinely overstate what a real kernel can reach (HBM
copy/add peaks at ~85-90% of wire speed; VPU peak depends on op mix).
Run once per device kind and fold the numbers into bench._PEAKS.

All timing is scan-differenced inside one jitted program (the axon tunnel
adds ~30 ms per dispatch and block_until_ready returns early there — see
scripts/component_cost.py).

Usage: python scripts/roofline.py [--mb 256] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256,
                    help="array size for the HBM stream test (MB)")
    ap.add_argument("--n", type=int, default=4096,
                    help="square matmul size for the MXU test")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--target-ms", type=float, default=300.0,
                    help="device work per timed call; the K2-K1 margin "
                         "must dwarf the ~30 ms tunnel jitter (a 4-pass "
                         "margin measured NEGATIVE bandwidth)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    # the axon sitecustomize force-registers its platform and ignores the
    # JAX_PLATFORMS env var; re-apply it as a config update (cf. conftest)
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", file=sys.stderr)

    def timed(fn, x, K, reps):
        def scanned(x):
            out, _ = lax.scan(lambda c, _: (fn(c), None), x, None, length=K)
            return out
        f = jax.jit(scanned)
        out = f(x)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])   # fence
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(x)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, time.time() - t0)
        return best

    def marginal(fn, x, per_pass_work, peak_guess, reps):
        """Per-pass seconds via K2-vs-K1 differencing, with K2 sized from
        an OPTIMISTIC peak guess so each timed call carries ~target_ms of
        device work (slower chips just run longer).  Tiny fixed Ks put the
        margin inside the tunnel jitter — measured negative throughput."""
        k2 = max(16, int(args.target_ms / 1e3 * peak_guess / per_pass_work))
        k1 = max(2, k2 // 8)
        return (timed(fn, x, k2, reps) - timed(fn, x, k1, reps)) / (k2 - k1)

    # ---- HBM stream: y = x * a + b over an array far beyond VMEM --------
    elems = args.mb * (1 << 20) // 4
    x = jnp.arange(elems, dtype=jnp.float32) * 1e-9

    def stream(v):
        return v * jnp.float32(1.0000001) + jnp.float32(1e-9)

    t = marginal(stream, x, 2 * elems * 4, 1000e9, args.reps)
    hbm_gbs = 2 * elems * 4 / t / 1e9          # read + write per pass
    print(f"HBM stream: {hbm_gbs:.1f} GB/s "
          f"({args.mb} MB array, {t*1e3:.2f} ms/pass)", file=sys.stderr)

    # ---- VPU f32: a chain of dependent FMAs on a VMEM-sized block -------
    vb = jnp.ones((1024, 1024), jnp.float32) * 0.999999
    CH = 256                                    # fused FMAs per pass

    def vpu(v):
        for _ in range(CH):
            v = v * jnp.float32(0.9999999) + jnp.float32(1e-9)
        return v

    t = marginal(vpu, vb, CH * 2 * vb.size, 15e12, args.reps)
    vpu_tf = CH * 2 * vb.size / t / 1e12
    print(f"VPU f32: {vpu_tf:.2f} TFLOP/s (chain of {CH} FMAs on 4 MB)",
          file=sys.stderr)

    # ---- MXU bf16: dependent square matmuls -----------------------------
    n = args.n
    a = jnp.asarray(np.random.default_rng(0).normal(size=(n, n)) / n,
                    jnp.bfloat16)

    def mxu(v):
        return jax.lax.dot_general(
            v, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    t = marginal(mxu, a, 2 * n ** 3, 400e12, args.reps)
    mxu_tf = 2 * n ** 3 / t / 1e12
    print(f"MXU bf16: {mxu_tf:.1f} TFLOP/s ({n}x{n} chained matmuls)",
          file=sys.stderr)

    rec = {
        "device_kind": dev.device_kind,
        "hbm_stream_gbs": round(hbm_gbs, 1),
        "vpu_f32_tflops": round(vpu_tf, 2),
        "mxu_bf16_tflops": round(mxu_tf, 1),
    }
    print(json.dumps(rec))
    # plausibility gate: a jittered margin can still produce nonsense;
    # never persist denominators outside physically sane TPU ranges
    sane = (50 < hbm_gbs < 5000 and 0.5 < vpu_tf < 100
            and 10 < mxu_tf < 2000)
    if not sane:
        print("SUSPECT measurement (outside sane TPU ranges) — "
              "not writing ROOFLINE.json", file=sys.stderr)
        sys.exit(1)
    # persist for bench.py: measured peaks are the honest attainable
    # denominators (vendor figures overstate; see module docstring)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
