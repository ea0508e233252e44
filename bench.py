"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric (BASELINE.md): batched SOCP solves/sec at 1e-8 duality gap on the
robust-least-squares family (config 3), on whatever accelerator is attached
(real TPU under the driver; CPU otherwise).  `vs_baseline` is the ratio to
the single-core NumPy oracle (the in-environment stand-in for single-core
Socp.jl — the reference publishes no numbers; see BASELINE.md).

The JSON line uses the unified socp_tpu.utils.metrics schema: alongside
solves/s it carries the BASELINE primary metrics (IPM iterations/s, KKT
factorize ms, KKT solve ms — measured by scan differencing inside one
jitted program, the only honest way through the ~30 ms dispatch tunnel)
and `achieved_vs_attainable_pct`, the lockstep iteration time against an
attainable-ceiling roofline (HBM bytes + VPU/MXU flops of the dd
iteration vs device peaks) — NOT against the irrelevant MXU-peak MFU
denominator alone.

Timing is device-resident: problem data is placed on device once via
`socp_tpu.prepare_batch`, and the steady-state timing syncs on the (tiny)
status vector — measuring solver throughput, not host-link bandwidth (the
dev TPU attaches through a tunnel whose 65MB problem upload would otherwise
dominate).

Extra diagnostics go to stderr; stdout carries exactly one JSON line.

Usage: python bench.py [--batch B] [--n N] [--quick]
"""

import argparse
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Device peak table: bf16 MXU TFLOP/s, HBM GB/s, VPU f32 TFLOP/s.
# MXU/HBM are vendor figures; VPU f32 is derived (lanes*ALUs*2*clock) and
# should be replaced by scripts/roofline.py's measured value per device
# kind when available.  Unknown kinds get no utilization claim.
_PEAKS = {
    "TPU v4":      (275.0, 1228.0, 4.3),
    "TPU v5 lite": (197.0, 819.0, 9.8),
    "TPU v5e":     (197.0, 819.0, 9.8),
    "TPU v5p":     (459.0, 2765.0, 11.5),
    "TPU v5":      (459.0, 2765.0, 11.5),
    "TPU v6 lite": (918.0, 1640.0, 14.7),
    "TPU v6e":     (918.0, 1640.0, 14.7),
}


def _iteration_model(n, m, refine_steps=1, nb=2):
    """Per-instance per-lockstep-iteration cost model of the dd-native IPM
    (kkt/dd_dense.py SHIPPING pipeline: ConstGram assembly + fused
    Cholesky/triangular-inverse + inverse-apply solves, p = 0 robust-LS
    shape).  Returns (hbm_bytes, mxu_flops, vpu_flops).

    Counted streams (dd = 8 B/elem (2xf32); a presliced matvec's 28
    slice-pair dots read 2 B/elem 28x on the constant side = 56 B/elem):
      m x n presliced matvecs: residuals (2) + per KKT solve GT/G (2 x
      (1+refine+1) solves... affine 1 + combined 1+refine) + refinement
      residual (2) + rank-correction columns U (1) -> 11 at refine=1
      (616 mn B);
      L-inverse applies: 2 per KKT solve x 3 solves over (n, n) slice
      arrays (336 n^2 B);
      factor: weighted ConstGram sum ((nb+2) x 8 n^2), equilibrate +
      delta (~24 n^2), fused panel Cholesky + base inverses + level GEMMs
      (~150 n^2), preslice Linv/Linv' (44 n^2);
      cone sweeps + state carries: ~40 dd m-vector ops x ~4 operands
      (~1300 m).

    MXU: matvecs 11 x 56nm + L-applies 6 x 56n^2 + chol/inv GEMMs
    (n^3/3 dd-MACs x 28 bf16 passes x 2 = ~19 n^3).
    VPU: unblocked 32-col panels ~800 n^2, base inversions + peels
    ~100 n^2, cone/elementwise ~600 m.

    The constants are +-30%-grade: the model's job is to place the
    attainable ceiling within a small factor so perf work is guided by
    measured distance, not to be an exact simulator.
    """
    solves = 2 + refine_steps                # KKT solves per iteration
    matvecs = 2 + 2 * solves + 2 * refine_steps + 1
    hbm = 56.0 * matvecs * m * n \
        + (56 * 2 * solves + 8 * (nb + 2) + 24 + 150 + 44) * n * n \
        + 1300.0 * m
    mxu = 56.0 * matvecs * n * m + 56 * 2 * solves * n * n + 19.0 * n ** 3
    vpu = 900.0 * n * n + 600.0 * m
    return float(hbm), float(mxu), float(vpu)


def _kkt_split_ms(cfg, layout, Gp, B, n, reps=2):
    """Measured KKT factorize / solve ms for a B-instance chunk via
    lax.scan differencing (run K times with a carry dependency inside one
    jitted program; difference, divide).  Uses the same dd pipeline the
    shipping batched path runs."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from socp_tpu.cones import dd_ops
    from socp_tpu.kkt import dd_dense
    from socp_tpu.ops import dd as ddm

    m = layout.m_pad
    rng = np.random.default_rng(0)
    e = np.asarray(dd_ops.identity(layout).hi, np.float64)
    s = jnp.asarray(np.tile(e, (B, 1)) * rng.uniform(1.0, 1.5, (B, m)),
                    jnp.float32)
    z = jnp.asarray(np.tile(e, (B, 1)) * rng.uniform(1.0, 1.5, (B, m)),
                    jnp.float32)
    G32 = ddm.from_f64(jnp.asarray(Gp, jnp.float64))        # (B, m, n) dd
    A0 = ddm.from_f32(jnp.zeros((0, n), jnp.float32))
    v0 = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    from socp_tpu.ops.ozaki import preslice

    v_scale = jax.vmap(lambda s_, z_: dd_ops.nt_scale(
        layout, ddm.from_f32(s_), ddm.from_f32(z_)))
    # constants computed once, outside the timed loop, like the shipping
    # driver: preslices + the per-block constant Grams (ConstGram)
    GT_s0 = jax.jit(jax.vmap(lambda g: preslice(g.T)))(G32)
    G_s0 = jax.jit(jax.vmap(preslice))(G32)
    has_cg = dd_dense.precompute_const_gram(layout, G32[0]) is not None
    cg0 = (jax.jit(jax.vmap(
        lambda g: dd_dense.precompute_const_gram(layout, g)))(G32)
        if has_cg else None)
    invert = True if cfg.invert_factor is None else cfg.invert_factor
    v_factor = jax.vmap(
        lambda sc, g, gts, gs, cg_: dd_dense.factor_dd(
            layout, sc, None, A0, g, cfg.delta_reg, GT_s=gts, G_s=gs,
            cg=cg_, invert=invert),
        in_axes=(0, 0, 0, 0, 0 if has_cg else None),
    )
    v_solve = jax.vmap(lambda k, bx: dd_dense.solve_dd(
        layout, k, A0, ddm.from_f32(bx),
        ddm.from_f32(jnp.zeros((0,), jnp.float32)),
        ddm.from_f32(jnp.zeros((m,), jnp.float32))))

    def timed(step, x0, K):
        def scanned(x):
            out, _ = lax.scan(lambda c, _: (step(c), None), x, None, length=K)
            return out
        f = jax.jit(scanned)
        out = f(x0)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = np.inf
        for _ in range(reps):
            t0 = time.time()
            out = f(x0)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, time.time() - t0)
        return best * 1e3

    def f_factor(s_):
        sc = v_scale(s_, z)
        kkt = v_factor(sc, G32, GT_s0, G_s0, cg0)
        # probe sums EVERY factor leaf: a single-element probe lets XLA
        # dead-code most of the factorization under test
        lh = kkt.L_H
        leaf = lh.Linv_s.S if hasattr(lh, "Linv_s") else lh.L.hi
        r = jnp.sum(leaf.astype(jnp.float32),
                    axis=tuple(range(1, leaf.ndim)))
        return s_ + 1e-30 * r[:, None]

    kkt0 = jax.jit(
        lambda s_, z_: v_factor(v_scale(s_, z_), G32, GT_s0, G_s0, cg0)
    )(s, z)

    def f_solve(v):
        dx, _, _ = v_solve(kkt0, v)
        return v * 0.5 + 0.5 * dx.hi

    # long-K marginals: the fused back-solve is now ~0.2 ms per chunk, so
    # the K=5-vs-1 difference (0.8 ms) drowned in the ~few-ms tunnel
    # timing jitter and could print 0.0; 33-vs-1 puts the solve marginal
    # at ~7 ms, well clear of it.  Clamp at 0 for pathological contention.
    factor_ms = max(0.0, (timed(f_factor, s, 9) - timed(f_factor, s, 1)) / 8)
    solve_ms = max(0.0, (timed(f_solve, v0, 33) - timed(f_solve, v0, 1)) / 32)
    return factor_ms, solve_ms              # per-chunk (B-instance) ms


def main():
    ap = argparse.ArgumentParser()
    # default batch = the BASELINE config-3 contract (4096 robust-LS
    # instances); runs as sequential chunks of one compiled executable
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--quick", action="store_true",
                    help="smaller problem for smoke runs")
    ap.add_argument("--dtype", default="float64",
                    help="carry dtype (float64 reaches 1e-8)")
    ap.add_argument("--factor-dtype", default="dd32",
                    help="factorization dtype: dd32 (double-word f32 on the "
                         "MXU/VPU — same 1e-8 accuracy as the emulated-f64 "
                         "factor at a fraction of the cost), float32, "
                         "float64, or 'none' for the carry dtype")
    ap.add_argument("--native-dd", action="store_true", default=None,
                    help="run the all-dd32 IPM driver (no f64 anywhere in "
                         "the hot loop); default: on for TPU")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-kkt-split", action="store_true",
                    help="skip the scan-differenced KKT factor/solve "
                         "timing (saves 4 small compiles)")
    ap.add_argument("--use-pallas", default=None,
                    choices=["auto", "on", "off"],
                    help="force the Pallas kernel dispatch (on = the "
                         "instance-tiled batched kernels on the lockstep "
                         "path; auto = config default)")
    ap.add_argument("--refine-steps", type=int, default=None,
                    help="iterative-refinement rounds per KKT solve "
                         "(default: config default = 1)")
    ap.add_argument("--gondzio", type=int, default=None,
                    help="Gondzio centrality correctors per iteration "
                         "(default: auto = 1 on TPU native_dd; 0 disables; "
                         "measured ~16-21%% fewer iterations at one extra "
                         "back-solve each — scripts/gondzio_iters.py)")
    ap.add_argument("--chunk", type=int, default=128,
                    help="max instances per device call; larger batches run "
                         "as sequential chunks of one compiled executable. "
                         "Smaller chunks win twice (measured: 4096 as "
                         "32x128 = 1137 solves/s vs 2x2048 = 640): each "
                         "chunk's lockstep loop exits at ITS OWN slowest "
                         "instance (straggler waste shrinks), and the "
                         "Ozaki slice arrays stop thrashing HBM (~1.8 GB "
                         "at B=2048)")
    args = ap.parse_args()
    if args.quick:
        args.batch, args.n = 32, 24

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
    from socp_tpu.models.robust_ls import robust_ls, robust_ls_batch
    from socp_tpu.utils import oracle
    from socp_tpu.utils.metrics import emit, metric_record

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() not in ("cpu",)
    native_dd = on_tpu if args.native_dd is None else args.native_dd
    log(f"device: {dev} | batch={args.batch} n={args.n} "
        f"| native_dd={native_dd}")

    fd = None if args.factor_dtype in ("none", "") else args.factor_dtype
    pallas = {None: None, "auto": None, "on": True, "off": False}[
        args.use_pallas]
    kw = {}
    if args.refine_steps is not None:
        kw["refine_steps"] = args.refine_steps
    cfg = SolverConfig(factor_dtype=fd, native_dd=native_dd,
                       use_pallas=pallas, gondzio_correctors=args.gondzio,
                       **kw)
    c, G, h, dims = robust_ls_batch(0, batch=args.batch, n=args.n)

    chunk = min(args.chunk, args.batch)
    assert args.batch % chunk == 0, "batch must be divisible by chunk"
    n_chunks = args.batch // chunk

    t0 = time.time()
    prepared = [
        socp_tpu.prepare_batch(
            c[i * chunk : (i + 1) * chunk], G[i * chunk : (i + 1) * chunk],
            h[i * chunk : (i + 1) * chunk], dims, config=cfg,
            dtype=np.dtype(args.dtype),
        )
        for i in range(n_chunks)
    ]
    for fn, dev_args, _ in prepared:
        out = fn(*dev_args)
        np.asarray(out[4])               # sync
    log(f"compile+first run: {time.time() - t0:.1f}s "
        f"({n_chunks} chunk(s) of {chunk})")

    best = np.inf
    for _ in range(args.reps):
        t0 = time.time()
        outs = []
        for fn, dev_args, _ in prepared:
            outs.append(fn(*dev_args))
        status = np.concatenate([np.asarray(o[4]) for o in outs])  # sync
        best = min(best, time.time() - t0)
    iters = np.concatenate([np.asarray(o[5]) for o in outs])
    stats = np.concatenate([np.asarray(o[6], np.float64) for o in outs])
    ok = int((status == 0).sum())
    max_gap = float(stats[:, 2].max())
    solves_per_s = args.batch / best
    iters_per_s = float(iters.sum()) / best
    # chunks run sequentially, each for ITS OWN slowest instance's count:
    # per-iteration time = wall / sum over chunks of that chunk's max
    chunk_iters = sum(
        float(iters[i * chunk : (i + 1) * chunk].max())
        for i in range(n_chunks)
    )
    lockstep_ms = best / max(chunk_iters, 1.0) * 1e3
    log(f"steady run: {best:.2f}s -> {solves_per_s:.1f} solves/s, "
        f"{iters_per_s:.0f} instance-iters/s | optimal {ok}/{args.batch} "
        f"| max gap {max_gap:.2e} | lockstep iter {lockstep_ms:.1f} ms")
    if ok < args.batch:
        log(f"WARNING: {args.batch - ok} instances not optimal")

    # ---- measured KKT factorize / solve split (BASELINE primary metric)
    _, _, layout0 = prepared[0]
    m_pad = layout0.m_pad
    n_ = c.shape[1]
    factor_ms = solve_ms = None
    if not args.no_kkt_split and native_dd:
        try:
            factor_ms, solve_ms = _kkt_split_ms(cfg, layout0,
                layout0.pad_rows(G[:chunk]), chunk, n_)
            log(f"KKT split (chunk of {chunk}): factorize {factor_ms:.2f} ms"
                f" | back-solve {solve_ms:.2f} ms")
        except Exception as exc:          # pragma: no cover - diagnostics
            log(f"kkt-split skipped: {type(exc).__name__}: {exc}")

    # ---- attainable-ceiling roofline (north star: measured distance to
    # speed-of-light, not MXU-peak MFU for a VPU/HBM-bound loop)
    hbm_b, mxu_f, vpu_f = _iteration_model(n_, m_pad, cfg.refine_steps)
    total_iters = float(iters.sum())
    mxu_tflops = total_iters * mxu_f / best / 1e12
    vpu_tflops = total_iters * vpu_f / best / 1e12
    hbm_gbs = total_iters * hbm_b / best / 1e9
    kind = dev.device_kind if on_tpu else ""
    peaks = next((v for k, v in _PEAKS.items() if kind.startswith(k)), None)
    # prefer measured peaks (scripts/roofline.py) over the vendor table —
    # the attainable ceiling should be what a real kernel on THIS chip can
    # reach, not a datasheet number
    try:
        import json as _json
        import os as _os2
        with open(_os2.path.join(_os2.path.dirname(
                _os2.path.abspath(__file__)), "ROOFLINE.json")) as f:
            r = _json.load(f)
        meas = (r.get("mxu_bf16_tflops", 0), r.get("hbm_stream_gbs", 0),
                r.get("vpu_f32_tflops", 0))
        if (on_tpu and r.get("device_kind") == kind
                and all(v > 0 for v in meas)):
            peaks = meas
            log(f"roofline denominators: measured (ROOFLINE.json) "
                f"MXU {peaks[0]} TF/s HBM {peaks[1]} GB/s VPU {peaks[2]} TF/s")
    except (OSError, KeyError, ValueError):
        pass
    mfu = attain_pct = None
    if peaks:
        peak_mxu, peak_hbm, peak_vpu = peaks
        mfu = 100.0 * mxu_tflops / peak_mxu
        # attainable chunk-lockstep-iteration time: every term at its own
        # device peak, take the binding resource (per instance x chunk)
        t_attain_ms = chunk * max(
            hbm_b / (peak_hbm * 1e9),
            mxu_f / (peak_mxu * 1e12),
            vpu_f / (peak_vpu * 1e12),
        ) * 1e3
        attain_pct = 100.0 * t_attain_ms / lockstep_ms
        bind = max(
            (hbm_b / (peak_hbm * 1e9), "HBM"),
            (mxu_f / (peak_mxu * 1e12), "MXU"),
            (vpu_f / (peak_vpu * 1e12), "VPU"),
        )[1]
        log(f"roofline: achieved MXU {mxu_tflops:.2f} TF/s (bf16, "
            f"{mfu:.2f}% of peak) | VPU-class dd {vpu_tflops:.3f} TF/s | "
            f"HBM {hbm_gbs:.1f} GB/s || attainable iter {t_attain_ms:.2f} ms"
            f" ({bind}-bound) vs measured {lockstep_ms:.2f} ms -> "
            f"{attain_pct:.1f}% of attainable")
    else:
        log(f"roofline: model HBM {hbm_gbs:.1f} GB/s, MXU {mxu_tflops:.2f} "
            f"TF/s, VPU {vpu_tflops:.3f} TF/s (no peak table for "
            f"'{kind or 'cpu'}' — no utilization claim)")

    # single-core NumPy oracle baseline (stand-in for single-core Socp.jl).
    # CAVEAT: the oracle is a plain-NumPy reference implementation; a
    # compiled single-core Socp.jl would plausibly be 5-20x faster than it,
    # so read vs_baseline/(5..20) as the honest vs-reference multiple.
    times = []
    for i in range(3):
        prob, _ = robust_ls(i, n=args.n)
        t0 = time.time()
        oracle.solve(prob.c, prob.G, prob.h, prob.dims)
        times.append(time.time() - t0)
    base = 1.0 / float(np.median(times))
    log(f"oracle baseline: {base:.2f} solves/s (median of 3)")

    emit(metric_record(
        "c3_contract_B4096", "batched_robust_ls_solves_per_sec_at_1e-8_gap",
        solves_per_s, "solves/s",
        vs_baseline=solves_per_s / base,
        solves_per_s=solves_per_s,
        iters_per_s=iters_per_s,
        kkt_factor_ms=factor_ms,
        kkt_solve_ms=solve_ms,
        lockstep_iter_ms=lockstep_ms,
        mfu_bf16_pct=mfu,
        achieved_vs_attainable_pct=attain_pct,
        mesh_devices=1,
        batch=args.batch, chunk=chunk, optimal=ok,
    ))


if __name__ == "__main__":
    main()
