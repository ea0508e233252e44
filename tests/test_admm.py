"""M5: consensus ADMM scenario solver vs the exact extensive form."""

import numpy as np
import jax
import pytest

import socp_tpu
from socp_tpu.models.stochastic import extensive_form, scenario_portfolio
from socp_tpu.parallel.admm import admm_consensus


def test_admm_matches_extensive_form():
    c, G, h, dims, A, b, info = scenario_portfolio(0, n=12, k=3,
                                                   n_scenarios=6)
    res = admm_consensus(c, G, h, dims, n_consensus=info["n"], A=A, b=b,
                         rho=1.0, outer_iters=100, tol=1e-6)
    assert res.inner_status_ok
    assert res.primal_res <= 1e-5

    ext = socp_tpu.solve(extensive_form(c, G, h, dims, A, b, info))
    assert ext.status_name == "optimal"
    # ADMM consensus objective matches the exact extensive-form optimum
    # (objective here is the scenario-average cost: divide extensive pcost
    # convention is already 1/S inside extensive_form's cE)
    assert abs(res.objective - ext.pcost) <= 5e-4 * max(1.0, abs(ext.pcost))
    # consensus weights satisfy first-stage constraints
    w = res.w_bar
    assert abs(w.sum() - 1.0) <= 1e-6
    assert w.min() >= -1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 faked devices")
def test_admm_sharded():
    from socp_tpu.parallel.mesh import batch_mesh

    c, G, h, dims, A, b, info = scenario_portfolio(1, n=10, k=3,
                                                   n_scenarios=8)
    res = admm_consensus(c, G, h, dims, n_consensus=info["n"], A=A, b=b,
                         rho=1.0, outer_iters=40, tol=1e-5,
                         mesh=batch_mesh(8))
    res0 = admm_consensus(c, G, h, dims, n_consensus=info["n"], A=A, b=b,
                          rho=1.0, outer_iters=40, tol=1e-5)
    assert res.inner_status_ok
    np.testing.assert_allclose(res.w_bar, res0.w_bar, atol=1e-6)
