"""Huge cones sharded across the mesh (SURVEY.md section 5 long-context
plan (a)), dd32-native: the sharded cone kernels + tall-skinny Ozaki Gram
KKT must match the single-device dense solver on the same problem."""

import numpy as np
import jax
import pytest

import socp_tpu
from socp_tpu import SolverConfig
from socp_tpu.parallel.hugecone import solve_huge, solve_huge_soc
from socp_tpu.parallel.mesh import block_mesh
from socp_tpu.problem import ConeDims, SocpProblem

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 faked devices"
)


def _huge_soc_problem(seed, n=12, l=6, q=41):
    """Feasible bounded problem with one big SOC: min c'x with
    ||B x - d|| <= t constraints encoded as (t-row; rows) plus box."""
    rng = np.random.default_rng(seed)
    m = l + q
    G = np.zeros((m, n))
    h = np.zeros(m)
    # orthant: box |x_i| <= 2 on the first l/2 coords (x <= 2 and -x <= 2)
    for i in range(l // 2):
        G[2 * i, i] = 1.0
        G[2 * i + 1, i] = -1.0
        h[2 * i] = 2.0
        h[2 * i + 1] = 2.0
    # SOC: ||B x - d|| <= a'x + b
    a = rng.normal(size=n) * 0.1
    B = rng.normal(size=(q - 1, n)) / np.sqrt(n)
    d = rng.normal(size=q - 1) * 0.1
    G[l] = -a
    h[l] = 5.0
    G[l + 1:] = -B
    h[l + 1:] = -d
    c = rng.normal(size=n)
    dims = ConeDims(l=l, qs=(q,))
    return SocpProblem(c=c, G=G, h=h, dims=dims), l, q


def test_hugecone_matches_dense_single_device():
    prob, l, q = _huge_soc_problem(0)
    mesh = block_mesh(1)
    x, s, z, status, k, stats = solve_huge_soc(
        prob.c, prob.G, prob.h, l, mesh=mesh
    )
    ref = socp_tpu.solve(prob)
    assert ref.status_name == "optimal"
    assert status.name == "OPTIMAL"
    assert abs(stats[0] - ref.pcost) <= 1e-6 * max(1.0, abs(ref.pcost))
    np.testing.assert_allclose(x, ref.x, atol=1e-6)
    # returned s is feasible for the original cones
    from socp_tpu.utils import oracle

    assert oracle.lambda_min(prob.dims, s) > -1e-9


@requires_multidevice
def test_hugecone_sharded_matches_single():
    """The SAME huge cone split over 8 devices: sharded arrow products,
    psum-reduced dots, tall-skinny Gram — equals the 1-device answer."""
    prob, l, q = _huge_soc_problem(1, n=10, l=8, q=57)
    out1 = solve_huge_soc(prob.c, prob.G, prob.h, l, mesh=block_mesh(1))
    out8 = solve_huge_soc(prob.c, prob.G, prob.h, l, mesh=block_mesh(8))
    assert out1[3].name == out8[3].name == "OPTIMAL"
    np.testing.assert_allclose(out8[0], out1[0], atol=1e-7)
    np.testing.assert_allclose(out8[5][:2], out1[5][:2], rtol=1e-7, atol=1e-9)


def test_hugecone_detects_primal_infeasible():
    """Farkas certificate through the huge cone's geometry: ||u|| <= t with
    t <= -1 forced by the orthant row (cf. models.primal_infeasible_soc)."""
    q = 17
    n = q
    G = np.zeros((1 + q, n))
    G[0, 0] = 1.0
    G[1:, :] = -np.eye(q)
    h = np.concatenate([[-1.0], np.zeros(q)])
    rng = np.random.default_rng(0)
    # pad the orthant to a shardable length with slack rows
    G = np.concatenate([G[:1], np.zeros((7, n)), G[1:]])
    h = np.concatenate([h[:1], np.ones(7), h[1:]])
    x, s, z, status, k, stats = solve_huge_soc(
        rng.normal(size=n), G, h, l=8, mesh=block_mesh(1)
    )
    assert status.name == "PRIMAL_INFEASIBLE"


@requires_multidevice
def test_hugecone_pure_soc_no_orthant():
    prob, l, q = _huge_soc_problem(2, n=8, l=0, q=33)
    out8 = solve_huge_soc(prob.c, prob.G, prob.h, 0, mesh=block_mesh(8))
    ref = socp_tpu.solve(prob)
    assert out8[3].name == "OPTIMAL" and ref.status_name == "optimal"
    assert abs(out8[5][0] - ref.pcost) <= 1e-6 * max(1.0, abs(ref.pcost))


def _multi_soc_problem(seed, n=8, l=5, qs=(9, 7), p=2):
    """Strictly feasible bounded fixture: orthant + several SOCs +
    coupling equalities, with a dense-solver cross-check."""
    rng = np.random.default_rng(seed)
    m = l + sum(qs)
    G = rng.normal(size=(m, n)) / np.sqrt(n)
    x_star = rng.normal(size=n)
    s = np.empty(m)
    s[:l] = rng.uniform(0.5, 1.5, l)
    off = l
    for q in qs:
        tail = rng.normal(size=q - 1)
        tail *= 0.3 / np.linalg.norm(tail)
        s[off] = 1.0
        s[off + 1 : off + q] = tail
        off += q
    h = G @ x_star + s
    A = rng.normal(size=(p, n))
    b = A @ x_star
    c = -(G.T @ rng.uniform(0.1, 1.0, m) + A.T @ rng.normal(size=p))
    return SocpProblem(c=c, G=G, h=h, dims=ConeDims(l=l, qs=qs), A=A, b=b)


def test_hugecone_multi_soc_equalities_matches_dense():
    """Round-3 scope lift: several huge SOCs + orthant + p coupling
    equalities through the sharded dd path == the dense solver."""
    prob = _multi_soc_problem(3)
    ref = socp_tpu.solve(prob)
    assert ref.status_name == "optimal"
    x, y, s, z, status, k, stats = solve_huge(
        prob.c, prob.G, prob.h, prob.dims.l, prob.dims.qs,
        A=prob.A, b=prob.b, mesh=block_mesh(1),
    )
    assert status.name == "OPTIMAL"
    assert abs(stats[0] - ref.pcost) <= 1e-6 * max(1.0, abs(ref.pcost))
    np.testing.assert_allclose(x, ref.x, atol=1e-5)


@requires_multidevice
def test_hugecone_multi_soc_sharded_matches_single():
    prob = _multi_soc_problem(4, n=10, l=8, qs=(25, 17), p=3)
    out1 = solve_huge(prob.c, prob.G, prob.h, prob.dims.l, prob.dims.qs,
                      A=prob.A, b=prob.b, mesh=block_mesh(1))
    out8 = solve_huge(prob.c, prob.G, prob.h, prob.dims.l, prob.dims.qs,
                      A=prob.A, b=prob.b, mesh=block_mesh(8))
    assert out1[4].name == out8[4].name == "OPTIMAL"
    np.testing.assert_allclose(out8[0], out1[0], atol=1e-6)
    np.testing.assert_allclose(out8[6][:3], out1[6][:3], rtol=1e-5,
                               atol=1e-8)


def test_hugecone_detects_dual_infeasible():
    """min -t s.t. ||u|| <= t rides the SOC axis to -inf (mirror of
    test_hugecone_detects_primal_infeasible; round-2 verdict weak #8)."""
    from socp_tpu.models.random_socp import dual_infeasible_soc

    prob = dual_infeasible_soc(0, q=12)
    x, s, z, status, k, stats = solve_huge_soc(
        prob.c, prob.G, prob.h, l=0, mesh=block_mesh(1)
    )
    assert status.name == "DUAL_INFEASIBLE"


def test_hugecone_history_and_max_iter():
    """Driver parity: history collection and the best-iterate/max-iter
    exit path (stats stay finite, iterate restored)."""
    prob = _multi_soc_problem(5)
    cfg = SolverConfig(max_iter=3, collect_history=True)
    out = solve_huge(prob.c, prob.G, prob.h, prob.dims.l, prob.dims.qs,
                     A=prob.A, b=prob.b, mesh=block_mesh(1), config=cfg)
    x, y, s, z, status, k, stats, hist = out
    assert status.name in ("MAX_ITERATIONS", "OPTIMAL")
    assert np.all(np.isfinite(stats))
    assert hist.shape[1] == 6 and hist.shape[0] == k
