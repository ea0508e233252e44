"""Config-1 (n=50 single solve) device-time vs dispatch-overhead split.

Round-2 verdict weak #1: the claim "config 1 is dispatch-latency-bound on
the tunneled dev chip" was plausible but unsubstantiated.  This script
publishes the split:

  1. dispatch floor  — round-trip of a trivial jitted scalar program
     (fetch-synced; block_until_ready lies on axon);
  2. marginal device iteration cost — max_iter differencing of the REAL
     c1 solve (pure device work, no per-iteration dispatch);
  3. end-to-end c1 latency (what bench_all reports);
  4. inferred device-only time = end_to_end - dispatch floor, cross-checked
     against iters * marginal + init.

Usage: python scripts/c1_split.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # the axon sitecustomize force-registers its platform and ignores the
    # JAX_PLATFORMS env var; re-apply it as a config update (cf. conftest)
    import os as _os
    if _os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)
    import socp_tpu
    from socp_tpu import SolverConfig
    from socp_tpu.models.random_socp import random_socp

    on_tpu = jax.default_backend() not in ("cpu",)
    log(f"device: {jax.devices()[0]}")

    # 1. dispatch floor: trivial program, fetch-synced
    triv = jax.jit(lambda x: x * 2.0)
    xs = jnp.ones(())
    np.asarray(triv(xs))
    floor = min(
        (lambda t0: (np.asarray(triv(xs)), time.time() - t0)[1])(time.time())
        for _ in range(10)
    )
    log(f"dispatch floor (trivial jitted scalar): {floor*1e3:.1f} ms")

    # 2/3. the real c1 solve at two iteration caps
    prob, _ = random_socp(0, n=50, l=10, qs=(10, 14, 20))
    cfg0 = SolverConfig(factor_dtype="dd32", native_dd=on_tpu)
    lat = {}
    iters_full = None
    for mi in (2, 50):
        cfg = SolverConfig(**{**cfg0.__dict__, "max_iter": mi})
        fn, dev_args, _ = socp_tpu.prepare_batch(
            prob.c[None], prob.G[None], prob.h[None], prob.dims,
            config=cfg, dtype=np.float64,
        )
        out = fn(*dev_args)
        np.asarray(out[4])
        best = np.inf
        for _ in range(5):
            t0 = time.time()
            out = fn(*dev_args)
            np.asarray(out[4])
            best = min(best, time.time() - t0)
        lat[mi] = best
        if mi == 50:
            iters_full = int(np.asarray(out[5])[0])
        log(f"max_iter={mi}: {best*1e3:.1f} ms "
            f"(iters ran: {int(np.asarray(out[5])[0])})")

    per_iter = (lat[50] - lat[2]) / max(iters_full - 2, 1)
    device_only = lat[50] - floor
    log(f"end-to-end {lat[50]*1e3:.1f} ms | inferred device-only "
        f"{device_only*1e3:.1f} ms | marginal {per_iter*1e3:.2f} ms/iter "
        f"x {iters_full} iters")

    print(json.dumps({
        "config": "c1_split",
        "end_to_end_ms": round(lat[50] * 1e3, 1),
        "dispatch_floor_ms": round(floor * 1e3, 1),
        "device_only_ms": round(device_only * 1e3, 1),
        "marginal_ms_per_iter": round(per_iter * 1e3, 2),
        "iters": iters_full,
    }))


if __name__ == "__main__":
    main()
