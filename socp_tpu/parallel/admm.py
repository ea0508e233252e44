"""Consensus ADMM over scenario subproblems (M5; BASELINE config 5,
SURVEY.md 2.3 "Scenario / outer-loop parallel").

Two-stage stochastic programs decompose into S scenario SOCPs coupled only
through the first-stage (consensus) variables:

    minimize (1/S) sum_i f_i(x_i)   s.t.  E x_i = w_bar  for all i

Scaled-form consensus ADMM:

    x_i^+    = argmin f_i(x_i) + (rho/2) || E x_i - w_bar + u_i ||^2
    w_bar^+  = mean_i (E x_i^+ + u_i)        <- ONE pmean over the mesh
    u_i^+    = u_i + E x_i^+ - w_bar^+

The x-update is itself an SOCP with constant quadratic term P = rho E'E and
a per-outer-iteration linear term — i.e. exactly our batched QP-SOCP
lockstep solver, so the inner solves run vmapped/sharded on the mesh (DP
over scenarios on ICI; the consensus mean is the only cross-scenario
traffic, matching the DCN-axis design for multi-host pods).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from socp_tpu import api
from socp_tpu.config import DEFAULT_CONFIG, SolverConfig
from socp_tpu.problem import ConeDims


@dataclasses.dataclass
class ADMMResult:
    w_bar: np.ndarray          # consensus first-stage solution
    x: np.ndarray              # (S, n) scenario solutions
    objective: float           # (1/S) sum_i f_i(x_i) at consensus point
    primal_res: float          # ||E x_i - w_bar|| (consensus violation)
    dual_res: float            # rho ||w_bar^+ - w_bar||
    outer_iterations: int
    inner_status_ok: bool


def admm_consensus(
    c: np.ndarray,             # (S, n) per-scenario linear objectives
    G: np.ndarray,             # (S, m, n)
    h: np.ndarray,             # (S, m)
    dims: ConeDims,
    n_consensus: int,          # consensus coords = x[:n_consensus]
    A: Optional[np.ndarray] = None,
    b: Optional[np.ndarray] = None,
    rho: float = 1.0,
    outer_iters: int = 50,
    tol: float = 1e-5,
    config: SolverConfig = DEFAULT_CONFIG,
    mesh=None,
    verbose: bool = False,
) -> ADMMResult:
    """Run consensus ADMM; inner solves via the batched lockstep IPM
    (sharded over `mesh` when given)."""
    S, n = c.shape
    nc = n_consensus
    E = np.zeros((n,))
    E[:nc] = 1.0
    P = rho * np.diag(E)               # shared quadratic term, constant

    w_bar = np.zeros(nc)
    u = np.zeros((S, nc))
    x = np.zeros((S, n))

    # The scenario data (G, h, A, b, P) is constant across outer iterations;
    # only the effective objective changes.  Upload everything once and swap
    # the (small) c each round — the inner solve stays device-resident, so
    # outer-loop cost is solver time, not host-link bandwidth.
    import jax
    import jax.numpy as jnp
    import numpy as np_

    state = {}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        (axis,) = mesh.axis_names

        def put_c(c_eff, dtype):
            return jax.device_put(
                jnp.asarray(c_eff, dtype),
                NamedSharding(mesh, PS(axis, None)),
            )
    else:
        def put_c(c_eff, dtype):
            return jnp.asarray(c_eff, dtype)

    def inner(c_eff):
        if not state:
            fn, args, layout = api.prepare_batch(
                c_eff, G, h, dims, A=A, b=b, P=P, config=config
            )
            if mesh is not None:
                args = (put_c(c_eff, args[0].dtype),) + tuple(
                    jax.device_put(a, NamedSharding(
                        mesh, PS(axis, *([None] * (a.ndim - 1)))
                    )) if a.ndim and a.shape[0] == c_eff.shape[0] else
                    jax.device_put(a, NamedSharding(mesh, PS()))
                    for a in args[1:]
                )
            state["fn"], state["args"] = fn, args
        else:
            args = state["args"]
            state["args"] = (put_c(c_eff, args[0].dtype),) + args[1:]
        out = state["fn"](*state["args"])
        x = np_.asarray(out[0], np_.float64)
        status = np_.asarray(out[4])
        return (x, None, None, None, status)

    pres = dres = np.inf
    it = 0
    ok = True
    for it in range(outer_iters):
        # x-update: min f_i + (rho/2)||x_c - w_bar + u_i||^2
        #   = SOCP with P = rho*diag(E), c_eff = c + rho*(u_i - w_bar) on
        #     consensus coords
        c_eff = c.copy()
        c_eff[:, :nc] += rho * (u - w_bar)
        out = inner(c_eff)
        x, status = out[0], out[4]
        ok = bool(np.all((status == 0)))

        xc = x[:, :nc]
        w_new = np.mean(xc + u, axis=0)
        u = u + xc - w_new
        pres = float(np.sqrt(np.mean(np.sum((xc - w_new) ** 2, axis=1))))
        dres = float(rho * np.linalg.norm(w_new - w_bar))
        w_bar = w_new
        if verbose:
            print(f"admm {it:3d} pres={pres:.3e} dres={dres:.3e}")
        if pres <= tol and dres <= tol:
            break

    # objective at the consensus point (first-stage coords forced to w_bar)
    x_cons = x.copy()
    x_cons[:, :nc] = w_bar
    objective = float(np.mean(np.sum(c * x_cons, axis=1)))
    return ADMMResult(
        w_bar=w_bar, x=x, objective=objective, primal_res=pres,
        dual_res=dres, outer_iterations=it + 1, inner_status_ok=ok,
    )
