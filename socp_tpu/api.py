"""Public solver API: host-side padding/layout, jitted core, unpadding.

    sol  = socp_tpu.solve(problem)                  # one SOCP
    sols = socp_tpu.solve_batch(c, G, h, dims)      # B SOCPs in lockstep

`solve_batch` is the DP path from SURVEY.md 2.3: B independent instances
vmapped into one jitted lockstep IPM; converged instances freeze via the
`done` mask while the rest keep iterating.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from socp_tpu.cones.layout import ConeLayout, make_layout
from socp_tpu.config import DEFAULT_CONFIG, SolverConfig
from socp_tpu.ipm import driver
from socp_tpu.problem import ConeDims, SocpProblem
from socp_tpu.solution import Solution, Status


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@functools.lru_cache(maxsize=256)
def _compiled(layout: ConeLayout, cfg: SolverConfig, has_P: bool, batched: bool,
              batch_A: bool, batch_P: bool, has_warm: bool = False):
    if cfg.native_dd:
        from socp_tpu.ipm import dd_driver

        base = functools.partial(
            dd_driver.solve_core_dd, layout, cfg, has_P=has_P
        )
    else:
        base = functools.partial(driver.solve_core, layout, cfg, has_P=has_P)
    if has_warm:
        def core(c, G, h, A, b, P, w):
            return base(c, G, h, A, b, P, warm=w)
    else:
        core = base
    if batched:
        in_axes = (0, 0, 0, 0 if batch_A else None, 0 if batch_A else None,
                   0 if batch_P else None)
        if has_warm:
            in_axes = in_axes + (0,)        # warm tuple batched per instance
        core = jax.vmap(core, in_axes=in_axes)
    return jax.jit(core)


def _empty_A(n: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    return np.zeros((0, n)), np.zeros((0,))


# Largest condensed-system n whose dd factor (L + LT, 4 f32 words each)
# comfortably fits VMEM for the Pallas VMEM-resident solves (16n^2 bytes;
# n=768 -> ~9.4 MB of ~16 MB/core).
_PALLAS_MAX_N = 768


def _resolve_pallas(config: SolverConfig, n: int, batch: int = 1) -> SolverConfig:
    """Resolve the None (auto) config fields to concrete values.

    use_pallas: batched solves keep the XLA substitution beyond a few
    instances — a vmapped pallas_call serializes instances over the grid,
    while the XLA columnwise substitution is batch-parallel.

    gondzio_correctors: 1 on TPU native_dd SINGLE-solve paths, where the
    dd factorization dominates an iteration, so one extra back-solve per
    corrector buys a measured ~16-21% iteration-count cut
    (scripts/gondzio_iters.py).  0 on the batched lockstep path: there the
    per-iteration cost is cone-sweep/launch-bound, not factor-bound, and
    the corrector's extra work outweighs the iteration cut (measured at
    the B=4096 c3 contract: 1099 solves/s with vs 1136 without).  Also 0
    off-TPU so CPU/f64 runs stay iteration-comparable to the oracle."""
    import dataclasses

    on_tpu = jax.default_backend() == "tpu"
    if config.use_pallas is None:
        auto = (
            batch <= 4
            and config.native_dd
            and n <= _PALLAS_MAX_N
            and on_tpu
        )
        config = dataclasses.replace(config, use_pallas=auto)
    if config.invert_factor is None:
        config = dataclasses.replace(
            config, invert_factor=bool(config.native_dd)
        )
    if config.gondzio_correctors is None:
        config = dataclasses.replace(
            config,
            gondzio_correctors=(
                1 if (config.native_dd and on_tpu and batch <= 4) else 0
            ),
        )
    return config


def solve(
    prob: SocpProblem,
    config: SolverConfig = DEFAULT_CONFIG,
    dtype=None,
    verbose: Optional[bool] = None,
    warm: Optional[tuple] = None,
) -> Solution:
    """Solve one SOCP (optionally with quadratic objective P).

    `warm`: optional (x, y, s, z) starting point in the ORIGINAL (unpadded)
    cone order — e.g. a previous Solution's fields after a small problem
    change.  s and z are recentered by config.warm_push (see config.py).
    """
    if verbose is not None and verbose != config.verbose:
        config = SolverConfig(**{**config.__dict__, "verbose": verbose})
    config = _resolve_pallas(config, prob.n)
    dtype = dtype or default_dtype()
    layout = make_layout(prob.dims, config.bucket_multiple)
    has_P = prob.P is not None
    Gp = jnp.asarray(layout.pad_rows(prob.G), dtype)
    hp = jnp.asarray(layout.pad_vec(prob.h), dtype)
    c = jnp.asarray(prob.c, dtype)
    A = jnp.asarray(prob.A, dtype)
    b = jnp.asarray(prob.b, dtype)
    P = jnp.asarray(prob.P if has_P else np.zeros((0, 0)), dtype)

    fn = _compiled(layout, config, has_P, batched=False, batch_A=False,
                   batch_P=False, has_warm=warm is not None)
    if warm is not None:
        xw, yw, sw, zw = warm
        wtup = (
            jnp.asarray(xw, dtype), jnp.asarray(yw, dtype),
            jnp.asarray(layout.pad_vec(np.asarray(sw)), dtype),
            jnp.asarray(layout.pad_vec(np.asarray(zw)), dtype),
        )
        x, y, s, z, status, k, stats, hist = fn(c, Gp, hp, A, b, P, wtup)
    else:
        x, y, s, z, status, k, stats, hist = fn(c, Gp, hp, A, b, P)
    stats = np.asarray(stats, np.float64)
    return Solution(
        history=(np.asarray(hist, np.float64)[: int(k)]
                 if config.collect_history else None),
        x=np.asarray(x, np.float64),
        y=np.asarray(y, np.float64),
        s=layout.unpad_vec(np.asarray(s, np.float64)),
        z=layout.unpad_vec(np.asarray(z, np.float64)),
        status=Status(int(status)),
        iterations=int(k),
        pcost=float(stats[0]),
        dcost=float(stats[1]),
        gap=float(stats[2]),
        relgap=float(stats[3]),
        pres=float(stats[4]),
        dres=float(stats[5]),
        inaccurate=bool(stats[6] > 0.5),
    )


def solve_batch(
    c: np.ndarray,              # (B, n)
    G: np.ndarray,              # (B, m, n)
    h: np.ndarray,              # (B, m)
    dims: ConeDims,
    A: Optional[np.ndarray] = None,   # (p, n) shared or (B, p, n)
    b: Optional[np.ndarray] = None,
    P: Optional[np.ndarray] = None,   # (n, n) shared or (B, n, n)
    config: SolverConfig = DEFAULT_CONFIG,
    dtype=None,
) -> list[Solution]:
    """Solve B same-shaped SOCPs in lockstep (vmapped jitted IPM)."""
    out = solve_batch_raw(c, G, h, dims, A=A, b=b, P=P, config=config,
                          dtype=dtype)
    x, y, s, z, status, k, stats = out[:7]
    hist = out[7] if len(out) > 7 else None
    B = x.shape[0]
    return [
        Solution(
            history=(hist[i, : int(k[i])] if hist is not None
                     and config.collect_history else None),
            x=x[i], y=y[i], s=s[i], z=z[i],
            status=Status(int(status[i])),
            iterations=int(k[i]),
            pcost=float(stats[i, 0]),
            dcost=float(stats[i, 1]),
            gap=float(stats[i, 2]),
            relgap=float(stats[i, 3]),
            pres=float(stats[i, 4]),
            dres=float(stats[i, 5]),
            inaccurate=bool(stats[i, 6] > 0.5),
        )
        for i in range(B)
    ]


def prepare_batch(
    c, G, h, dims: ConeDims, A=None, b=None, P=None,
    config: SolverConfig = DEFAULT_CONFIG, dtype=None,
    has_warm: bool = False,
):
    """Device-resident batched solve: returns `(fn, args, layout)` with all
    problem data padded and placed on device once.  `fn(*args)` runs the
    jitted lockstep IPM with zero host->device traffic — the benchmarking /
    power-user path (repeated solves of the same instances, e.g. warm-up vs
    steady-state timing, measure solver throughput rather than PCIe).

    `has_warm=True` compiles a variant taking one extra argument: a
    (x, y, s, z) tuple of per-instance PADDED warm starts (e.g. the raw
    outputs of a previous `fn(*args)` call) — `fn(*args, warm_tuple)`."""
    B, n = np.shape(c)
    config = _resolve_pallas(config, n, batch=B)
    dtype = dtype or default_dtype()
    layout = make_layout(dims, config.bucket_multiple)
    has_P = P is not None
    batch_A = A is not None and np.ndim(A) == 3
    batch_P = has_P and np.ndim(P) == 3
    if A is None:
        A, b = _empty_A(n, dtype)
    if P is None:
        P = np.zeros((0, 0))

    Gp = jnp.asarray(layout.pad_rows(np.asarray(G)), dtype)
    hp = jnp.asarray(layout.pad_vec(np.asarray(h)), dtype)
    fn = _compiled(layout, config, has_P, batched=True, batch_A=batch_A,
                   batch_P=batch_P, has_warm=has_warm)
    args = (jnp.asarray(c, dtype), Gp, hp, jnp.asarray(A, dtype),
            jnp.asarray(b, dtype), jnp.asarray(P, dtype))
    return fn, args, layout


def solve_batch_raw(
    c, G, h, dims: ConeDims, A=None, b=None, P=None,
    config: SolverConfig = DEFAULT_CONFIG, dtype=None,
):
    """Batched solve returning raw stacked arrays (unpadding host-side)."""
    fn, args, layout = prepare_batch(c, G, h, dims, A=A, b=b, P=P,
                                     config=config, dtype=dtype)
    x, y, s, z, status, k, stats, hist = fn(*args)
    s = layout.unpad_vec(np.asarray(s, np.float64))
    z = layout.unpad_vec(np.asarray(z, np.float64))
    return (np.asarray(x, np.float64), np.asarray(y, np.float64), s, z,
            np.asarray(status), np.asarray(k), np.asarray(stats, np.float64),
            np.asarray(hist, np.float64))
