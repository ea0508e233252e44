"""Compare precision strategies on the attached accelerator.

Runs the batched robust-LS workload (BASELINE config 3 shape) through each
precision path and prints solves/s + accuracy, to pick bench.py's default.
Device-resident timing (see bench.py): inputs are uploaded once, reps sync
on the tiny status vector only.

Usage: python scripts/perf_compare.py [--batch B] [--n N] [--paths a,b,c]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


PATHS = {
    # name: (carry dtype, config kwargs)
    "f64": ("float64", {}),
    "f64_f32factor": ("float64", {"factor_dtype": "float32"}),
    "f64_ddfactor": ("float64", {"factor_dtype": "dd32"}),
    "dd32": ("float64", {"native_dd": True}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--paths", default="f64_ddfactor,dd32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    # persistent compile cache: the dd-native IPM graph costs 200-450s to
    # compile on the tunneled dev TPU; cached executables reload across
    # processes in ~1/4 the time (measured)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)
    import socp_tpu
    from socp_tpu import SolverConfig
    from socp_tpu.models.robust_ls import robust_ls_batch

    log(f"device: {jax.devices()[0]} | batch={args.batch} n={args.n}")
    c, G, h, dims = robust_ls_batch(0, batch=args.batch, n=args.n)

    for name in args.paths.split(","):
        dtype, kw = PATHS[name]
        cfg = SolverConfig(**kw)
        try:
            t0 = time.time()
            fn, dev_args, _ = socp_tpu.prepare_batch(
                c, G, h, dims, config=cfg, dtype=np.dtype(dtype)
            )
            out = fn(*dev_args)
            status = np.asarray(out[4])
            compile_s = time.time() - t0
            best = np.inf
            for _ in range(args.reps):
                t0 = time.time()
                out = fn(*dev_args)
                status = np.asarray(out[4])
                best = min(best, time.time() - t0)
            iters = np.asarray(out[5])
            stats = np.asarray(out[6], np.float64)
            ok = int((status == 0).sum())
            max_gap = float(stats[:, 2].max())
            max_pres = float(stats[:, 4].max())
            log(f"{name:16s} {args.batch/best:9.1f} solves/s | "
                f"optimal {ok}/{args.batch} | max gap {max_gap:.2e} "
                f"pres {max_pres:.2e} | iters max {int(iters.max())} "
                f"| compile {compile_s:.0f}s")
        except Exception as e:  # noqa: BLE001
            log(f"{name:16s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
