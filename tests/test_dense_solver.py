"""M1: the jitted JAX solver vs the oracle, end-to-end (SURVEY.md 4.2
differential testing), on all fixture families and status codes."""

import numpy as np
import pytest

import socp_tpu
from socp_tpu import SolverConfig
from socp_tpu.models.antenna import antenna_design, sidelobe_level
from socp_tpu.models.portfolio import portfolio, portfolio_risk
from socp_tpu.models.random_socp import (
    dual_infeasible_lp,
    primal_infeasible_lp,
    random_socp,
)
from socp_tpu.models.robust_ls import robust_ls
from socp_tpu.utils import oracle


def _oracle(prob, **kw):
    return oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A,
                        b=prob.b, P=prob.P, **kw)


@pytest.mark.parametrize("seed", range(6))
def test_matches_oracle_random(seed):
    prob, sol = random_socp(seed, n=30, l=8, qs=(4, 6, 10), p=5)
    ro = _oracle(prob)
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    assert rj.gap <= 1e-7
    assert abs(rj.pcost - ro["pcost"]) <= 1e-6 * max(1.0, abs(ro["pcost"]))
    assert abs(rj.pcost - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))
    # primal/dual feasibility of the returned point
    assert rj.pres <= 1e-7 and rj.dres <= 1e-7
    # iteration counts should be in the same ballpark (same algorithm)
    assert abs(rj.iterations - ro["iterations"]) <= 2


def test_qp_extension():
    prob, sol = random_socp(3, n=25, l=5, qs=(5, 8), p=4, quadratic=True)
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    assert abs(rj.pcost - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_no_equalities():
    prob, sol = random_socp(4, n=20, l=10, qs=(8, 6), p=0)
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    assert abs(rj.pcost - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_rank_deficient_G_with_A():
    """m < n: H = G'W^-2 G singular; the rho*A'A augmentation must cover it."""
    prob, sol = random_socp(7, n=40, l=6, qs=(5, 8), p=25)
    assert prob.m < prob.n
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    assert abs(rj.pcost - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_statuses():
    assert socp_tpu.solve(primal_infeasible_lp(0)).status_name == "primal_infeasible"
    assert socp_tpu.solve(dual_infeasible_lp(0)).status_name == "dual_infeasible"


def test_statuses_soc_geometry():
    """Farkas certificates through CONE geometry (the dual ray lives on the
    SOC boundary), not just crossed orthant halfspaces."""
    from socp_tpu.models.random_socp import (dual_infeasible_soc,
                                             primal_infeasible_soc)

    for seed in (0, 1):
        r = socp_tpu.solve(primal_infeasible_soc(seed))
        assert r.status_name == "primal_infeasible"
    r = socp_tpu.solve(dual_infeasible_soc(0))
    assert r.status_name == "dual_infeasible"
    # the dd-native driver detects the same certificates
    rdd = socp_tpu.solve(primal_infeasible_soc(0),
                         config=SolverConfig(native_dd=True))
    assert rdd.status_name == "primal_infeasible"
    rdd = socp_tpu.solve(dual_infeasible_soc(0),
                         config=SolverConfig(native_dd=True))
    assert rdd.status_name == "dual_infeasible"
    prob, _ = random_socp(0, n=30, l=8, qs=(4, 6, 10), p=5)
    r = socp_tpu.solve(prob, config=SolverConfig(max_iter=2))
    assert r.status_name == "max_iterations"
    assert r.iterations == 2


def test_model_portfolio():
    prob, info = portfolio(0, n=64, k=8)
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    w = rj.x
    assert abs(np.sum(w) - 1.0) < 1e-6
    assert portfolio_risk(info, w) <= info["sigma_max"] * (1 + 1e-6)
    ro = _oracle(prob)
    assert abs(rj.pcost - ro["pcost"]) <= 1e-7 * max(1.0, abs(ro["pcost"]))


def test_model_robust_ls():
    prob, info = robust_ls(0, n=24, k=48)
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    x = rj.x[:24]
    obj = np.linalg.norm(info["D"] @ x - info["d"]) + info["rho"] * np.linalg.norm(x)
    assert abs(rj.pcost - obj) <= 1e-6 * max(1.0, obj)


def test_model_antenna():
    prob, info = antenna_design(0, n_elem=8, n_angles=40)
    rj = socp_tpu.solve(prob)
    assert rj.status_name == "optimal"
    assert sidelobe_level(info, rj.x) <= rj.pcost * (1 + 1e-5)


def test_f32_with_refinement_reaches_1e6():
    """f32 factorization + f64 refinement: a looser-tolerance sanity check
    on CPU; the full 1e-8 mixed-precision story is exercised on TPU."""
    prob, sol = random_socp(2, n=30, l=8, qs=(4, 6, 10), p=5)
    cfg = SolverConfig(
        refine_steps=2, refine_in_f64=True, delta_reg=1e-6,
        abstol=1e-6, reltol=1e-6, feastol=1e-6,
    )
    rj = socp_tpu.solve(prob, config=cfg, dtype=np.float32)
    assert rj.status_name == "optimal"
    assert abs(rj.pcost - sol.pcost) <= 1e-4 * max(1.0, abs(sol.pcost))


def test_warm_start():
    """Warm starting from a nearby solution converges in fewer iterations
    and to the same answer (both drivers)."""
    prob, sol = random_socp(9, n=30, l=8, qs=(4, 6, 10), p=5)
    cold = socp_tpu.solve(prob)
    assert cold.status_name == "optimal"
    # perturb the objective slightly: the old solution is a good start
    prob2 = type(prob)(c=prob.c * 1.01, G=prob.G, h=prob.h, dims=prob.dims,
                       A=prob.A, b=prob.b)
    cold2 = socp_tpu.solve(prob2)
    warm2 = socp_tpu.solve(prob2, warm=(cold.x, cold.y, cold.s, cold.z))
    assert warm2.status_name == "optimal"
    assert abs(warm2.pcost - cold2.pcost) <= 1e-7 * max(1.0, abs(cold2.pcost))
    assert warm2.iterations < cold2.iterations
    # dd driver path
    cfg = SolverConfig(native_dd=True)
    warm_dd = socp_tpu.solve(prob2, config=cfg,
                             warm=(cold.x, cold.y, cold.s, cold.z))
    assert warm_dd.status_name == "optimal"
    assert abs(warm_dd.pcost - cold2.pcost) <= 1e-7 * max(1.0, abs(cold2.pcost))


def test_sparse_inputs_accepted():
    """scipy.sparse G/A/P densify transparently (Julia-ecosystem parity)."""
    import scipy.sparse as sp

    prob, sol = random_socp(8, n=20, l=6, qs=(5, 7), p=4)
    sp_prob = type(prob)(
        c=prob.c, G=sp.csr_matrix(prob.G), h=prob.h, dims=prob.dims,
        A=sp.csc_matrix(prob.A), b=prob.b,
    )
    r = socp_tpu.solve(sp_prob)
    assert r.status_name == "optimal"
    assert abs(r.pcost - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_returned_cone_order_unpadded():
    """s, z come back in the user's original cone order with s in K."""
    prob, _ = random_socp(5, n=30, l=8, qs=(4, 6, 10), p=5)
    rj = socp_tpu.solve(prob)
    assert rj.s.shape == (prob.m,)
    assert oracle.lambda_min(prob.dims, rj.s) > -1e-9
    assert oracle.lambda_min(prob.dims, rj.z) > -1e-9
    np.testing.assert_allclose(
        prob.G @ rj.x + rj.s, prob.h, atol=1e-6 * max(1, np.abs(prob.h).max())
    )


def test_history_collection():
    from socp_tpu.models.robust_ls import robust_ls

    prob, _ = robust_ls(0, n=12)
    r = socp_tpu.solve(prob, config=SolverConfig(collect_history=True))
    assert r.status.name == "OPTIMAL"
    assert r.history is not None and r.history.shape == (r.iterations, 6)
    gaps = r.history[:, 2]
    assert gaps[-1] <= 1e-6          # gap column marches down
    assert gaps[0] > gaps[-1]
    # without the flag, no history
    r2 = socp_tpu.solve(prob)
    assert r2.history is None
