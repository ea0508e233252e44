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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 faked devices")
def test_admm_pod_mesh_2d():
    """The 2-D scenario x blocks pod mesh: the scenario batch shards over
    BOTH axes (hierarchical consensus all-reduce) and matches 1-device."""
    from socp_tpu.parallel.runtime import pod_mesh

    mesh = pod_mesh(scenario_size=2)            # (2, 4) on 8 fake devices
    assert mesh.devices.shape == (2, 4)
    c, G, h, dims, A, b, info = scenario_portfolio(2, n=10, k=3,
                                                   n_scenarios=16)
    res = admm_consensus(c, G, h, dims, n_consensus=info["n"], A=A, b=b,
                         rho=1.0, outer_iters=30, tol=1e-5, mesh=mesh)
    res0 = admm_consensus(c, G, h, dims, n_consensus=info["n"], A=A, b=b,
                          rho=1.0, outer_iters=30, tol=1e-5)
    assert res.inner_status_ok
    np.testing.assert_allclose(res.w_bar, res0.w_bar, atol=1e-6)


def test_admm_checkpoint_resume(tmp_path):
    """Interrupt at round 4 via the snapshot, resume, and land on the same
    answer as the uninterrupted run (checkpoint is start-of-round state)."""
    from socp_tpu.utils.checkpoint import SolverCheckpoint

    c, G, h, dims, A, b, info = scenario_portfolio(3, n=10, k=3,
                                                   n_scenarios=4)
    kw = dict(n_consensus=info["n"], A=A, b=b, rho=1.0, tol=0.0)
    path = str(tmp_path / "admm_ck.npz")
    full = admm_consensus(c, G, h, dims, outer_iters=8, **kw)
    part = admm_consensus(c, G, h, dims, outer_iters=4,
                          checkpoint_every=4, checkpoint_path=path, **kw)
    ck = SolverCheckpoint.load(path)
    assert ck.iteration == 4
    resumed = admm_consensus(c, G, h, dims, outer_iters=8,
                             resume_from=ck, **kw)
    assert resumed.outer_iterations == 4          # rounds 4..7 only
    np.testing.assert_allclose(resumed.w_bar, full.w_bar, rtol=1e-12,
                               atol=1e-12)


def test_admm_scenario_chunked_matches_unchunked():
    """scenario_chunk runs the inner solves in sequential chunks of one
    compiled executable (the HBM-bounding path for the 65k-scenario
    contract); per-instance freezing makes chunked == unchunked exactly."""
    c, G, h, dims, A, b, info = scenario_portfolio(5, n=10, k=3,
                                                   n_scenarios=8)
    kw = dict(n_consensus=info["n"], A=A, b=b, rho=1.0, outer_iters=6,
              tol=0.0)
    base = admm_consensus(c, G, h, dims, **kw)
    chnk = admm_consensus(c, G, h, dims, scenario_chunk=4, **kw)
    assert chnk.inner_status_ok == base.inner_status_ok
    np.testing.assert_allclose(chnk.w_bar, base.w_bar, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(chnk.x, base.x, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(chnk.primal_res, base.primal_res, rtol=1e-9)


def test_admm_chunked_checkpoint_resume(tmp_path):
    """Checkpoint/resume round-trips through the chunked path (warm starts
    are concatenated into the snapshot and re-split on resume)."""
    from socp_tpu.utils.checkpoint import SolverCheckpoint

    c, G, h, dims, A, b, info = scenario_portfolio(6, n=10, k=3,
                                                   n_scenarios=8)
    kw = dict(n_consensus=info["n"], A=A, b=b, rho=1.0, tol=0.0,
              scenario_chunk=4)
    path = str(tmp_path / "admm_ck_chunk.npz")
    full = admm_consensus(c, G, h, dims, outer_iters=6, **kw)
    admm_consensus(c, G, h, dims, outer_iters=3,
                   checkpoint_every=3, checkpoint_path=path, **kw)
    ck = SolverCheckpoint.load(path)
    assert ck.iteration == 3
    resumed = admm_consensus(c, G, h, dims, outer_iters=6,
                             resume_from=ck, **kw)
    assert resumed.outer_iterations == 3
    np.testing.assert_allclose(resumed.w_bar, full.w_bar, rtol=1e-12,
                               atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 faked devices")
def test_admm_chunked_sharded():
    """scenario_chunk composes with a mesh-sharded scenario batch."""
    from socp_tpu.parallel.mesh import batch_mesh

    c, G, h, dims, A, b, info = scenario_portfolio(7, n=10, k=3,
                                                   n_scenarios=16)
    kw = dict(n_consensus=info["n"], A=A, b=b, rho=1.0, outer_iters=5,
              tol=0.0)
    base = admm_consensus(c, G, h, dims, **kw)
    chnk = admm_consensus(c, G, h, dims, mesh=batch_mesh(8),
                          scenario_chunk=8, **kw)
    assert chnk.inner_status_ok
    np.testing.assert_allclose(chnk.w_bar, base.w_bar, atol=1e-8)


def test_admm_adaptive_rho_converges():
    """A deliberately bad initial rho must still converge via residual
    balancing (and report the adapted value)."""
    c, G, h, dims, A, b, info = scenario_portfolio(4, n=10, k=3,
                                                   n_scenarios=4)
    res = admm_consensus(c, G, h, dims, n_consensus=info["n"], A=A, b=b,
                         rho=1e-3, outer_iters=60, tol=1e-5, adapt_rho=True)
    assert res.inner_status_ok
    assert res.primal_res <= 1e-5 and res.dual_res <= 1e-5
    assert res.rho != 1e-3                        # it actually adapted
