"""M0: NumPy oracle correctness (the executable spec; SURVEY.md section 7.2).

Covers the reference capability checklist from SURVEY.md section 7.4 at the
oracle level: cone kernels, NT scaling identities, KKT-constructed random
problems to 1e-8 gap, all five status codes, QP extension, verbose log.
"""

import numpy as np
import pytest

from socp_tpu.problem import ConeDims
from socp_tpu.models.random_socp import (
    random_socp,
    primal_infeasible_lp,
    dual_infeasible_lp,
)
from socp_tpu.models.robust_ls import robust_ls
from socp_tpu.models.portfolio import portfolio, portfolio_risk
from socp_tpu.models.antenna import antenna_design, sidelobe_level
from socp_tpu.utils import oracle


# ----------------------------- cone kernels -------------------------------


def _interior_point(rng, dims):
    u = rng.normal(size=dims.dim)
    u[: dims.l] = np.abs(u[: dims.l]) + 0.5
    for sl in dims.soc_slices():
        u[sl.start] = np.linalg.norm(u[sl.start + 1 : sl.stop]) + rng.uniform(0.3, 1.5)
    return u


DIMS = ConeDims(l=5, qs=(2, 3, 7))


def test_jordan_identities():
    rng = np.random.default_rng(0)
    e = oracle.cone_identity(DIMS)
    for _ in range(10):
        u = _interior_point(rng, DIMS)
        v = _interior_point(rng, DIMS)
        # u o e = u
        np.testing.assert_allclose(oracle.jprod(DIMS, u, e), u, atol=1e-12)
        # jdiv inverts jprod:  u \ (u o v) = v
        np.testing.assert_allclose(
            oracle.jdiv(DIMS, u, oracle.jprod(DIMS, u, v)), v, atol=1e-10
        )


def test_nt_scaling_identity():
    """W z = W^-1 s = lambda and lambda'lambda = s'z (Appendix A)."""
    rng = np.random.default_rng(1)
    for _ in range(10):
        s = _interior_point(rng, DIMS)
        z = _interior_point(rng, DIMS)
        sc = oracle.NTScaling(DIMS, s, z)
        np.testing.assert_allclose(sc.apply_W(z), sc.apply_Winv(s), rtol=1e-10)
        np.testing.assert_allclose(sc.lam @ sc.lam, s @ z, rtol=1e-10)
        assert oracle.lambda_min(DIMS, sc.lam) > 0
        # W^-1 W = I
        u = rng.normal(size=DIMS.dim)
        np.testing.assert_allclose(sc.apply_Winv(sc.apply_W(u)), u, atol=1e-10)


def test_max_step_boundary():
    """u + alpha*du sits exactly on the cone boundary at alpha = max_step."""
    rng = np.random.default_rng(2)
    for _ in range(20):
        u = _interior_point(rng, DIMS)
        du = rng.normal(size=DIMS.dim)
        alpha = oracle.max_step(DIMS, u, du)
        if np.isinf(alpha):
            # direction never leaves the cone: a big step stays inside
            assert oracle.lambda_min(DIMS, u + 1e6 * du) >= -1e-6
        else:
            lm = oracle.lambda_min(DIMS, u + alpha * du)
            assert abs(lm) < 1e-8
            assert oracle.lambda_min(DIMS, u + 0.999 * alpha * du) > 0


# ----------------------------- full solves --------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_random_socp_known_optimum(seed):
    prob, sol = random_socp(seed, n=30, l=8, qs=(4, 6, 10), p=5)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b)
    assert res["status_name"] == "optimal"
    assert res["gap"] <= 1e-7
    assert abs(res["pcost"] - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_random_qp_socp():
    prob, sol = random_socp(3, n=25, l=5, qs=(5, 8), p=4, quadratic=True)
    res = oracle.solve(
        prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b, P=prob.P
    )
    assert res["status_name"] == "optimal"
    assert abs(res["pcost"] - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_no_equalities():
    # note m >= n so rank([P;A;G]) = n holds (standard well-posedness
    # assumption, same as CVXOPT's)
    prob, sol = random_socp(4, n=20, l=10, qs=(8, 6), p=0)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims)
    assert res["status_name"] == "optimal"
    assert abs(res["pcost"] - sol.pcost) <= 1e-6 * max(1.0, abs(sol.pcost))


def test_primal_infeasible():
    prob = primal_infeasible_lp(0)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims)
    assert res["status_name"] == "primal_infeasible"


def test_dual_infeasible():
    prob = dual_infeasible_lp(0)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims)
    assert res["status_name"] == "dual_infeasible"


def test_max_iter_status():
    prob, _ = random_socp(0, n=30, l=8, qs=(4, 6, 10), p=5)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b,
                       max_iter=2)
    assert res["status_name"] == "max_iterations"


def test_verbose_log(capsys):
    prob, _ = random_socp(1, n=10, l=4, qs=(3,), p=2)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b,
                       verbose=True)
    out = capsys.readouterr().out
    assert "gap=" in out and "pcost=" in out
    assert len(res["log"]) == res["iterations"] + 1


# ------------------------- benchmark model families ------------------------


def test_robust_ls_model():
    prob, info = robust_ls(0, n=20, k=40)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims)
    assert res["status_name"] == "optimal"
    x = res["x"][:20]
    obj = np.linalg.norm(info["D"] @ x - info["d"]) + info["rho"] * np.linalg.norm(x)
    assert abs(res["pcost"] - obj) <= 1e-6 * max(1.0, obj)


def test_portfolio_model():
    prob, info = portfolio(0, n=40, k=5)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b)
    assert res["status_name"] == "optimal"
    w = res["x"]
    assert abs(np.sum(w) - 1.0) < 1e-6
    assert np.min(w) > -1e-7
    assert portfolio_risk(info, w) <= info["sigma_max"] * (1 + 1e-6)


def test_antenna_model():
    prob, info = antenna_design(0, n_elem=8, n_angles=40)
    res = oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b)
    assert res["status_name"] == "optimal"
    t = res["pcost"]
    assert sidelobe_level(info, res["x"]) <= t * (1 + 1e-5)
    # unit target gain
    a0 = info["steering_target"]
    n_elem = info["n_elem"]
    w = res["x"][:n_elem] + 1j * res["x"][n_elem : 2 * n_elem]
    np.testing.assert_allclose(np.conj(a0) @ w, 1.0 + 0j, atol=1e-6)
