"""Weak-scaling harness for the block-Schur solver (north star: >=70%
scaling efficiency 1 host -> 4 hosts).

Holds blocks-per-device constant and sweeps the mesh size, reporting
per-IPM-iteration wall time and scaling efficiency as one JSON line per
mesh size.  On the dev box this runs on the virtual CPU mesh
(`--xla_force_host_platform_device_count`), which validates the harness
and the SPMD program but NOT interconnect performance — every "device" is
a thread in one address space.  See docs/SCALING.md for the measurement
methodology the day real pod hardware is attached.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_harness.py [--per-dev 8] [--sizes 1,2,4,8] [--ring]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-dev", type=int, default=8,
                    help="blocks per device (held constant = weak scaling)")
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--p", type=int, default=8)
    ap.add_argument("--ring", action="store_true",
                    help="use the ppermute-ring Schur reduction")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize force-registers its platform and ignores the
    # JAX_PLATFORMS env var; re-apply it as a config update (cf. conftest)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from socp_tpu import SolverConfig
    from socp_tpu.parallel.mesh import block_mesh
    from socp_tpu.parallel.schur import random_block_problem, solve_block

    cfg = SolverConfig(ring_schur=args.ring, max_iter=20)
    ndev_avail = len(jax.devices())
    base_time = None
    for ndev in [int(s) for s in args.sizes.split(",")]:
        if ndev > ndev_avail:
            print(f"# skip ndev={ndev}: only {ndev_avail} devices",
                  file=sys.stderr)
            continue
        K = args.per_dev * ndev
        prob, _ = random_block_problem(0, K=K, nb=args.nb, p=args.p)
        mesh = block_mesh(ndev)
        out = solve_block(prob, mesh=mesh, config=cfg)     # compile+run
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            out = solve_block(prob, mesh=mesh, config=cfg)
            best = min(best, time.time() - t0)
        iters = max(out[5], 1)
        per_iter = best / iters
        if base_time is None:
            base_time = per_iter
        eff = base_time / per_iter     # weak scaling: ideal = 1.0
        print(json.dumps({
            "ndev": ndev, "blocks": K, "blocks_per_dev": args.per_dev,
            "iters": out[5], "s_per_iter": round(per_iter, 5),
            "weak_scaling_eff": round(eff, 3),
            "ring": args.ring,
            "backend": jax.default_backend(),
        }))


if __name__ == "__main__":
    main()
