"""Iteration-count effect of the Gondzio correctors on the contract family.

The B=4096 contract metric is throughput, and each chunk's lockstep loop
runs until its SLOWEST instance converges — so the straggler iteration
count (per-chunk max), not the mean, is what a corrector must cut.  This
script measures per-instance and per-chunk-max iterations on the robust-LS
family for gondzio_correctors in {0, 1, 2}.  Iteration counts are
platform-independent: run it on CPU, apply the conclusion on TPU (each
corrector's wall cost there is ~1 extra back-solve ~ 5% of an iteration).

Usage: python scripts/gondzio_iters.py [--batch 128] [--n 100] [--chunk 32]
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
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--native-dd", action="store_true",
                    help="measure the dd32 driver instead of f64 (slower "
                         "on CPU; counts track closely)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import socp_tpu
    from socp_tpu import SolverConfig
    from socp_tpu.models.robust_ls import robust_ls_batch

    c, G, h, dims = robust_ls_batch(0, batch=args.batch, n=args.n)
    ch = args.chunk
    for k in (0, 1, 2):
        cfg = SolverConfig(gondzio_correctors=k, native_dd=args.native_dd,
                           factor_dtype="dd32" if args.native_dd else None)
        iters, ok = [], 0
        t0 = time.time()
        for i in range(0, args.batch, ch):
            x, y, s, z, status, its, stats, _ = socp_tpu.solve_batch_raw(
                c[i:i+ch], G[i:i+ch], h[i:i+ch], dims, config=cfg)
            iters.append(np.asarray(its))
            ok += int((np.asarray(status) == 0).sum())
        iters = np.concatenate(iters)
        chunk_max = sum(int(iters[i:i+ch].max())
                        for i in range(0, args.batch, ch))
        print(f"correctors={k}: optimal {ok}/{args.batch} | "
              f"iters mean {iters.mean():.2f} max {iters.max()} | "
              f"sum-of-chunk-max {chunk_max} "
              f"(lockstep work at chunk={ch}) | {time.time()-t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
