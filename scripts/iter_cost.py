"""Marginal per-iteration cost of the real lockstep solve, by differencing
max_iter, for each precision path (device-resident, syncs on status)."""

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
    ap.add_argument("--paths", default="f64_ddfactor,dd32")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import socp_tpu
    from socp_tpu import SolverConfig
    from socp_tpu.models.robust_ls import robust_ls_batch

    c, G, h, dims = robust_ls_batch(0, batch=args.batch, n=args.n)
    print(f"device: {jax.devices()[0]} B={args.batch} n={c.shape[1]}",
          file=sys.stderr)

    KW = {"f64": {}, "f64_ddfactor": {"factor_dtype": "dd32"},
          "dd32": {"native_dd": True}}

    for name in args.paths.split(","):
        ts = {}
        for mi in (2, 6):
            cfg = SolverConfig(max_iter=mi, **KW[name])
            fn, dev_args, _ = socp_tpu.prepare_batch(
                c, G, h, dims, config=cfg, dtype=np.float64
            )
            out = fn(*dev_args)
            np.asarray(out[4])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                out = fn(*dev_args)
                np.asarray(out[4])
                best = min(best, time.time() - t0)
            ts[mi] = best * 1e3
        per_it = (ts[6] - ts[2]) / 4
        print(f"{name:14s} max_iter2 {ts[2]:7.1f} ms  max_iter6 {ts[6]:7.1f} "
              f"ms  -> {per_it:6.1f} ms/iter")


if __name__ == "__main__":
    main()
