"""Robust least-squares SOCP (BASELINE config-3 family).

    minimize  ||Dx - d||_2 + rho * ||x||_2

as an SOCP over variables (x, t1, t2):

    minimize    t1 + rho * t2
    subject to  ||Dx - d|| <= t1     (SOC of dim k+1)
                ||x||      <= t2     (SOC of dim n+1)

This family is the batched benchmark workload: 4096 independent instances
(n=100) solved in lockstep under vmap on one chip.
"""

from __future__ import annotations

import numpy as np

from socp_tpu.problem import ConeDims, SocpProblem


def robust_ls(
    seed: int, n: int = 100, k: int | None = None, rho: float = 0.1
) -> tuple[SocpProblem, dict]:
    """One robust-LS instance; returns (problem, info with closed-form check).

    Variables v = (x in R^n, t1, t2).  Rows of G (cone order):
      SOC1 (dim k+1): s = (t1, Dx - d)
      SOC2 (dim n+1): s = (t2, x)
    """
    rng = np.random.default_rng(seed)
    if k is None:
        k = 2 * n
    D = rng.normal(size=(k, n)) / np.sqrt(n)
    x0 = rng.normal(size=n)
    d = D @ x0 + 0.1 * rng.normal(size=k)

    nv = n + 2
    m = (k + 1) + (n + 1)
    G = np.zeros((m, nv))
    h = np.zeros(m)
    # SOC1: s_0 = t1  ->  -t1 + s_0 = 0 ; s_1: = Dx - d -> -Dx + s = -d
    G[0, n] = -1.0
    G[1 : k + 1, :n] = -D
    h[1 : k + 1] = -d
    # SOC2: s_0 = t2 ; s_1: = x
    G[k + 1, n + 1] = -1.0
    G[k + 2 :, :n] = -np.eye(n)
    c = np.zeros(nv)
    c[n] = 1.0
    c[n + 1] = rho
    dims = ConeDims(l=0, qs=(k + 1, n + 1))
    prob = SocpProblem(c=c, G=G, h=h, dims=dims)
    return prob, {"D": D, "d": d, "rho": rho}


def robust_ls_batch(seed: int, batch: int, n: int = 100, k: int | None = None,
                    rho: float = 0.1):
    """Batch of independent robust-LS instances with identical shapes.

    Returns stacked (c, G, h) arrays of shape (batch, ...) plus the shared
    ConeDims — ready for the vmapped solver.
    """
    probs = [robust_ls(seed + i, n=n, k=k, rho=rho)[0] for i in range(batch)]
    c = np.stack([pr.c for pr in probs])
    G = np.stack([pr.G for pr in probs])
    h = np.stack([pr.h for pr in probs])
    return c, G, h, probs[0].dims
