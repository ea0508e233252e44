"""Run all five BASELINE benchmark configs at bench-friendly scales.

Prints one JSON line per config to stdout in the unified
socp_tpu.utils.metrics schema (so iterations/s and KKT timings appear
under the same keys as bench.py and the scaling harness); diagnostics and
a per-config phase-time report go to stderr.  Sizes are chosen to keep
TPU compile times manageable; the headline config-3 number comes from
bench.py.

Usage: python scripts/bench_all.py [--configs 1,2,3,4,5] [--scale small|full]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_single(prob, cfg, reps=3):
    """Single-instance latency via the batched path with B=1 (device-resident)."""
    import socp_tpu

    B_c = prob.c[None]
    B_G = prob.G[None]
    B_h = prob.h[None]
    has_A = prob.A is not None and prob.A.size
    A = prob.A[None] if has_A else None
    b = prob.b[None] if has_A else None   # batched A => batched b
    fn, dev_args, _ = socp_tpu.prepare_batch(
        B_c, B_G, B_h, prob.dims, A=A, b=b, config=cfg, dtype=np.float64
    )
    out = fn(*dev_args)
    status = np.asarray(out[4])
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = fn(*dev_args)
        status = np.asarray(out[4])
        best = min(best, time.time() - t0)
    stats = np.asarray(out[6], np.float64)
    return best, int(status[0]), float(stats[0, 2]), int(np.asarray(out[5])[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--scale", default="small", choices=["small", "full"])
    args = ap.parse_args()
    configs = set(args.configs.split(","))
    full = args.scale == "full"

    import jax

    # persistent compile cache: the dd-native IPM graph costs 200-450s to
    # compile on the tunneled dev TPU; cached executables reload across
    # processes in ~1/4 the time (measured)
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
    from socp_tpu.utils.metrics import emit, metric_record
    from socp_tpu.utils.profiling import PhaseTimers

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = SolverConfig(factor_dtype="dd32", native_dd=on_tpu)
    log(f"device: {jax.devices()[0]} | native_dd={on_tpu}")
    timers = PhaseTimers()

    if "1" in configs:
        from socp_tpu.models.random_socp import random_socp

        with timers.phase("c1_random_n50"):
            prob, known = random_socp(0, n=50, l=10, qs=(10, 14, 20))
            t, status, gap, iters = bench_single(prob, cfg)
        log(f"config1 random n=50: {t*1e3:.1f} ms, status {status}, "
            f"gap {gap:.1e}, iters {iters}")
        emit(metric_record(
            "c1_random_n50_single", "single_solve_latency", t * 1e3, "ms",
            iters_per_s=iters / t, status=status, iters=iters,
            mesh_devices=1,
        ))

    if "2" in configs:
        from socp_tpu.models.portfolio import portfolio

        with timers.phase("c2_portfolio_n500"):
            prob, info = portfolio(0, n=500, k=20)
            t, status, gap, iters = bench_single(prob, cfg)
        log(f"config2 portfolio n=500: {t*1e3:.1f} ms, status {status}, "
            f"gap {gap:.1e}, iters {iters}")
        emit(metric_record(
            "c2_portfolio_n500_single", "single_solve_latency", t * 1e3,
            "ms", iters_per_s=iters / t, status=status, iters=iters,
            mesh_devices=1,
        ))

    if "3" in configs:
        from socp_tpu.models.robust_ls import robust_ls_batch

        B = 4096 if full else 512
        chunk = min(B, 128)              # measured optimum (see bench.py)
        with timers.phase("c3_robust_ls"):
            c, G, h, dims = robust_ls_batch(0, batch=B, n=100)
            prepared = [
                socp_tpu.prepare_batch(
                    c[i : i + chunk], G[i : i + chunk], h[i : i + chunk],
                    dims, config=cfg, dtype=np.float64,
                )
                for i in range(0, B, chunk)
            ]
            for fn, dev_args, _ in prepared:
                np.asarray(fn(*dev_args)[4])
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                outs = [fn(*dev_args) for fn, dev_args, _ in prepared]
                status = np.concatenate([np.asarray(o[4]) for o in outs])
                best = min(best, time.time() - t0)
        iters = np.concatenate([np.asarray(o[5]) for o in outs])
        ok = int((status == 0).sum())
        log(f"config3 robust-LS B={B}: {B/best:.0f} solves/s "
            f"({ok}/{B} optimal)")
        emit(metric_record(
            "c3_robust_ls_batched", "batched_throughput", B / best,
            "solves/s", solves_per_s=B / best,
            iters_per_s=float(iters.sum()) / best,
            batch=B, optimal=ok, mesh_devices=1,
        ))

    if "4" in configs:
        from socp_tpu.parallel.schur import random_block_problem, solve_block
        from socp_tpu.parallel.mesh import block_mesh
        from socp_tpu.problem import ConeDims

        # full: 10240 blocks x 10 vars = 102,400 vars / 20,480 cones
        # (BASELINE contract: 100k vars, 10k cones)
        K = 10240 if full else 512
        with timers.phase("c4_block_schur"):
            prob, pcost = random_block_problem(
                0, K=K, nb=10, p=8,
                block_dims=ConeDims(l=4, qs=(6,)),
            )
            mesh = block_mesh()
            t0 = time.time()
            x, y, s, z, status, k, stats = solve_block(prob, mesh=mesh,
                                                       config=cfg)
            first = time.time() - t0
            t0 = time.time()
            x, y, s, z, status, k, stats = solve_block(prob, mesh=mesh,
                                                       config=cfg)
            steady = time.time() - t0
        nvars = K * prob.c.shape[1]
        log(f"config4 block K={K} ({nvars} vars, {2*K} cones): "
            f"{steady:.2f}s steady ({first:.0f}s first), status {status}, "
            f"iters {k}, gap {stats[2]:.1e}")
        emit(metric_record(
            "c4_block_schur", "block_solve_latency", steady, "s",
            iters_per_s=int(k) / steady, K=K, nvars=nvars,
            status=int(status), iters=int(k),
            mesh_devices=int(mesh.devices.size),
        ))

    if "5" in configs:
        from socp_tpu.models.stochastic import scenario_portfolio
        from socp_tpu.parallel.admm import admm_consensus

        # full scale IS the BASELINE configs[4] contract: 65,536 scenarios
        # (scenario-chunked inner solves bound the transient HBM footprint)
        S = 65536 if full else 256
        chunk = min(S, 2048)
        with timers.phase("c5_admm"):
            c, G, h, dims, A, b, info = scenario_portfolio(
                0, n=20, n_scenarios=S
            )
            # 2 warm-up rounds: round 1 compiles the cold-start inner
            # variant, round 2 the warm-start variant (both timed below)
            admm_consensus(c, G, h, dims, info["n"], A=A, b=b, rho=1.0,
                           outer_iters=2, config=cfg, scenario_chunk=chunk)
            t0 = time.time()
            res = admm_consensus(c, G, h, dims, info["n"], A=A, b=b,
                                 rho=1.0, outer_iters=10, config=cfg,
                                 scenario_chunk=chunk)
            dt = time.time() - t0
        log(f"config5 ADMM S={S}: {dt:.1f}s for {res.outer_iterations} outer "
            f"iters, pres {res.primal_res:.2e}, inner ok {res.inner_status_ok}")
        emit(metric_record(
            "c5_admm_scenarios", "admm_outer_round", dt / res.outer_iterations,
            "s/outer-iter", S=S, outer=res.outer_iterations,
            scenario_chunk=chunk, inner_status_ok=bool(res.inner_status_ok),
            mesh_devices=1,
        ))

    log("--- phase times ---\n" + timers.report())


if __name__ == "__main__":
    main()
