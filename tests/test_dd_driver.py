"""The all-dd32 IPM driver (native_dd=True) vs the f64 driver (differential).

The dd driver is the shipping TPU hot path; on CPU it runs the same code
(with f64-backed error-free transforms, see ops/dd.py) so a small problem
keeps compile time manageable while covering the full driver: init,
Mehrotra loop, refinement, certificates, exit restoration.
"""

import numpy as np

from socp_tpu import SolverConfig, solve
from socp_tpu.models.portfolio import portfolio
from socp_tpu.models.robust_ls import robust_ls


def test_dd_driver_matches_f64_robust_ls():
    prob, info = robust_ls(0, n=12)
    r64 = solve(prob)
    rdd = solve(prob, config=SolverConfig(native_dd=True))
    assert rdd.status.name == "OPTIMAL"
    assert rdd.gap <= 1e-8 or rdd.relgap <= 1e-8
    # dd exit now returns hi+lo summed in f64 (sub-f32-ulp accuracy), so the
    # two drivers must agree far below the old ~6e-8 f32 rounding floor.
    assert abs(rdd.pcost - r64.pcost) <= 1e-9 * max(1.0, abs(r64.pcost))
    np.testing.assert_allclose(rdd.x, r64.x, atol=2e-9)


def test_dd_driver_portfolio_with_equalities():
    prob, info = portfolio(3, n=16, k=4)
    r64 = solve(prob)
    rdd = solve(prob, config=SolverConfig(native_dd=True))
    assert rdd.status.name == "OPTIMAL"
    # both drivers certify 1e-8 gaps but along slightly different dd/f64
    # trajectories, so agreement is gap-grade (1e-8), not exit-precision
    assert abs(rdd.pcost - r64.pcost) <= 2e-8 * max(1.0, abs(r64.pcost))
    np.testing.assert_allclose(rdd.x, r64.x, atol=1e-7)
