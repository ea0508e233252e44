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
    ap.add_argument("--profile", metavar="LOGDIR", default=None,
                    help="wrap the largest mesh's timed solve in a "
                         "jax.profiler trace (docs/SCALING.md protocol 5); "
                         "view with TensorBoard/Perfetto")
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
    from socp_tpu.utils.metrics import emit, metric_record
    from socp_tpu.utils.profiling import trace

    cfg = SolverConfig(ring_schur=args.ring, max_iter=20)
    ndev_avail = len(jax.devices())
    sizes = [int(s) for s in args.sizes.split(",") if int(s) <= ndev_avail]
    for skipped in (int(s) for s in args.sizes.split(",")
                    if int(s) > ndev_avail):
        print(f"# skip ndev={skipped}: only {ndev_avail} devices",
              file=sys.stderr)
    base_time = None
    for ndev in sizes:
        K = args.per_dev * ndev
        prob, _ = random_block_problem(0, K=K, nb=args.nb, p=args.p)
        mesh = block_mesh(ndev)
        out = solve_block(prob, mesh=mesh, config=cfg)     # compile+run
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            out = solve_block(prob, mesh=mesh, config=cfg)
            best = min(best, time.time() - t0)
        if args.profile and ndev == sizes[-1]:
            # device-level trace of ONE solve at the largest mesh
            with trace(args.profile) as logdir:
                solve_block(prob, mesh=mesh, config=cfg)
            print(f"# profiler trace -> {logdir}", file=sys.stderr)
        iters = max(out[5], 1)
        per_iter = best / iters
        if base_time is None:
            base_time = per_iter
        eff = base_time / per_iter     # weak scaling: ideal = 1.0
        emit(metric_record(
            f"scaling_ndev{ndev}", "block_schur_iter_time", per_iter,
            "s/iter", iters_per_s=1.0 / per_iter, mesh_devices=ndev,
            blocks=K, blocks_per_dev=args.per_dev, iters=int(out[5]),
            weak_scaling_eff=round(eff, 3), ring=args.ring,
            backend=jax.default_backend(),
        ))


if __name__ == "__main__":
    main()
