"""M3 batching: vmapped lockstep solves must match single solves
(SURVEY.md 4.2 "batched = unbatched"), with per-instance convergence masks
freezing finished instances and statuses independent per lane."""

import numpy as np

import socp_tpu
from socp_tpu import SolverConfig
from socp_tpu.models.random_socp import random_socp
from socp_tpu.models.robust_ls import robust_ls_batch


def test_batched_equals_single():
    B = 4
    probs = [random_socp(s, n=20, l=6, qs=(4, 6), p=3)[0] for s in range(B)]
    c = np.stack([pr.c for pr in probs])
    G = np.stack([pr.G for pr in probs])
    h = np.stack([pr.h for pr in probs])
    A = np.stack([pr.A for pr in probs])
    b = np.stack([pr.b for pr in probs])
    sols = socp_tpu.solve_batch(c, G, h, probs[0].dims, A=A, b=b)
    for pr, sb in zip(probs, sols):
        s1 = socp_tpu.solve(pr)
        assert sb.status_name == "optimal"
        assert abs(sb.pcost - s1.pcost) <= 1e-7 * max(1.0, abs(s1.pcost))
        # lockstep masking must not corrupt converged iterates; x agrees up
        # to the solution's intrinsic conditioning (objective matches 1e-7,
        # x only to ~sqrt(gap) near weakly-determined optima)
        np.testing.assert_allclose(sb.x, s1.x, atol=2e-3)


def test_batched_robust_ls():
    c, G, h, dims = robust_ls_batch(0, batch=8, n=16, k=24)
    sols = socp_tpu.solve_batch(c, G, h, dims)
    assert all(s.status_name == "optimal" for s in sols)
    iters = [s.iterations for s in sols]
    # instances converge at different iterations; freezing keeps them exact
    assert max(s.gap for s in sols) <= 1e-7


def test_batched_mixed_statuses():
    """One infeasible lane must not poison the optimal lanes (the failure-
    isolation requirement from SURVEY.md section 5)."""
    from socp_tpu.models.random_socp import primal_infeasible_lp

    good = primal_infeasible_lp(0)
    # feasible variant: drop the contradictory row by relaxing h
    import copy

    feas = copy.deepcopy(good)
    feas.h = feas.h.copy()
    feas.h[1] = 2.0  # x0 <= 2 instead of x0 <= 0: feasible
    c = np.stack([good.c, feas.c])
    G = np.stack([good.G, feas.G])
    h = np.stack([good.h, feas.h])
    sols = socp_tpu.solve_batch(c, G, h, good.dims,
                                config=SolverConfig(max_iter=80))
    assert sols[0].status_name == "primal_infeasible"
    assert sols[1].status_name == "optimal"
    s1 = socp_tpu.solve(feas, config=SolverConfig(max_iter=80))
    assert abs(sols[1].pcost - s1.pcost) <= 1e-7 * max(1.0, abs(s1.pcost))
