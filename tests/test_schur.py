"""M4: block-partitioned KKT with mesh-distributed Schur reduction."""

import numpy as np
import jax
import pytest

from socp_tpu import SolverConfig
from socp_tpu.parallel.mesh import block_mesh
from socp_tpu.parallel.schur import (
    BlockSocpProblem,
    random_block_problem,
    solve_block,
)
from socp_tpu.problem import ConeDims
from socp_tpu.utils import oracle

requires_multidevice = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 faked devices"
)


def _assemble_dense(prob: BlockSocpProblem):
    """Flatten the block problem to one dense SOCP (oracle cross-check)."""
    K, nb = prob.c.shape
    mb = prob.block_dims.dim
    p = prob.b.shape[0]
    n = K * nb
    c = prob.c.reshape(-1)
    G = np.zeros((K * mb, n))
    h = prob.h.reshape(-1)
    A = np.zeros((p, n))
    for i in range(K):
        G[i * mb : (i + 1) * mb, i * nb : (i + 1) * nb] = prob.G[i]
        A[:, i * nb : (i + 1) * nb] = prob.A[i]
    dims = ConeDims(
        l=0,
        qs=(),
    )
    # product cone: K copies of the block cone, in block order
    l_total = 0
    qs = []
    # orthant coords of each block stay orthant but the flat layout
    # interleaves them; easiest correct mapping: treat each block's cone
    # as (l, qs) appended in order with a row permutation that moves all
    # orthant rows first.
    bl = prob.block_dims
    perm = []
    for i in range(K):
        perm.extend(range(i * mb, i * mb + bl.l))
    for i in range(K):
        perm.extend(range(i * mb + bl.l, (i + 1) * mb))
        qs.extend(bl.qs)
    l_total = K * bl.l
    perm = np.asarray(perm)
    dims = ConeDims(l=l_total, qs=tuple(qs))
    return c, G[perm], h[perm], dims, A, prob.b


def test_block_matches_oracle_single_device():
    mesh = block_mesh(1)
    prob, pstar = random_block_problem(0, K=4, nb=6, p=3)
    x, y, s, z, status, k, stats = solve_block(prob, mesh=mesh)
    assert status.name == "OPTIMAL"
    assert abs(stats[0] - pstar) <= 1e-6 * max(1.0, abs(pstar))
    cF, GF, hF, dimsF, AF, bF = _assemble_dense(prob)
    ro = oracle.solve(cF, GF, hF, dimsF, A=AF, b=bF)
    assert ro["status_name"] == "optimal"
    assert abs(stats[0] - ro["pcost"]) <= 1e-6 * max(1.0, abs(ro["pcost"]))


@requires_multidevice
def test_block_schur_sharded_matches_single():
    prob, pstar = random_block_problem(1, K=16, nb=6, p=4)
    x1, y1, s1, z1, st1, k1, stats1 = solve_block(prob, mesh=block_mesh(1))
    x8, y8, s8, z8, st8, k8, stats8 = solve_block(prob, mesh=block_mesh(8))
    assert st1.name == st8.name == "OPTIMAL"
    assert abs(stats1[0] - stats8[0]) <= 1e-7 * max(1.0, abs(stats1[0]))
    assert abs(stats8[0] - pstar) <= 1e-6 * max(1.0, abs(pstar))
    np.testing.assert_allclose(y1, y8, atol=1e-5)


@requires_multidevice
def test_block_qp():
    prob, _ = random_block_problem(2, K=8, nb=6, p=3)
    rng = np.random.default_rng(0)
    K, nb = prob.c.shape
    prob.P = np.broadcast_to(0.5 * np.eye(nb), (K, nb, nb)).copy()
    x, y, s, z, status, k, stats = solve_block(prob, mesh=block_mesh(8))
    assert status.name == "OPTIMAL"
    cF, GF, hF, dimsF, AF, bF = _assemble_dense(prob)
    PF = np.zeros((K * nb, K * nb))
    for i in range(K):
        PF[i * nb : (i + 1) * nb, i * nb : (i + 1) * nb] = prob.P[i]
    ro = oracle.solve(cF, GF, hF, dimsF, A=AF, b=bF, P=PF)
    assert abs(stats[0] - ro["pcost"]) <= 1e-6 * max(1.0, abs(ro["pcost"]))


@requires_multidevice
def test_ring_schur_matches_psum():
    """The ppermute-ring Schur reduction is numerically equivalent to the
    monolithic psum (up to float reassociation of the 8-term sum)."""
    prob, pstar = random_block_problem(5, K=16, nb=6, p=4)
    base = solve_block(prob, mesh=block_mesh(8))
    ring = solve_block(prob, mesh=block_mesh(8),
                       config=SolverConfig(ring_schur=True))
    assert base[4].name == ring[4].name == "OPTIMAL"
    np.testing.assert_allclose(ring[0], base[0], atol=1e-8)
    np.testing.assert_allclose(ring[6][:6], base[6][:6], rtol=1e-6,
                               atol=1e-9)


@requires_multidevice
def test_ring_schur_indivisible_chunks():
    """p not divisible by the chunk count must still work (regression:
    jnp.split required an equal division; p=6 with 4 chunks trace-failed)."""
    prob, pstar = random_block_problem(6, K=8, nb=6, p=6)
    ring = solve_block(prob, mesh=block_mesh(8),
                       config=SolverConfig(ring_schur=True))
    assert ring[4].name == "OPTIMAL"
    assert abs(ring[6][0] - pstar) <= 1e-6 * max(1.0, abs(pstar))


@requires_multidevice
def test_ring_allreduce_unit():
    """ring_allreduce == psum on raw arrays, chunked and unchunked."""
    import functools

    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from socp_tpu.parallel.collectives import ring_allreduce

    mesh = block_mesh(8)
    x = np.random.default_rng(0).normal(size=(8, 4, 12))

    for chunks in (1, 3):
        def body(xl):
            ring = ring_allreduce(xl[0], "blocks", 8, n_chunks=chunks)
            ref = lax.psum(xl[0], "blocks")
            return ring[None], ref[None]

        ring, ref = jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=P("blocks"),
            out_specs=(P("blocks"), P("blocks")),
        ))(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ring), np.asarray(ref),
                                   rtol=1e-12)


def test_block_history_and_stats_parity():
    """solve_block exposes the driver-parity stats layout and, with
    collect_history, the per-iteration table (VERDICT r1 weak #6)."""
    mesh = block_mesh(1)
    prob, pstar = random_block_problem(4, K=4, nb=6, p=3)
    cfg = SolverConfig(collect_history=True)
    x, y, s, z, status, k, stats, hist = solve_block(prob, mesh=mesh,
                                                     config=cfg)
    assert status.name == "OPTIMAL"
    assert stats.shape == (7,)
    assert stats[2] <= 1e-7                        # gap converged
    assert stats[6] in (0.0, 1.0)                  # inaccurate flag present
    assert hist.shape == (k, 6)
    gaps = hist[:, 2]
    assert gaps[-1] <= 1e-6 and gaps[0] > gaps[-1]


@requires_multidevice
def test_block_schur_dd_factor():
    """dd32 per-block factor pipeline matches the f64 path and the oracle."""
    prob, pstar = random_block_problem(3, K=16, nb=6, p=4)
    # 2 refinement rounds: the dd factor's refinement contraction is
    # q = kappa*2^-48 per round; this fixture drives kappa(H) ~ 1e11 near
    # its 1e-10 gap, so one round floors the dual residual at ~q^2 > 1e-8.
    cfg = SolverConfig(factor_dtype="dd32", refine_steps=2)
    x, y, s, z, status, k, stats = solve_block(prob, mesh=block_mesh(8),
                                               config=cfg)
    assert status.name == "OPTIMAL"
    assert stats[2] <= 1e-7                       # gap
    assert abs(stats[0] - pstar) <= 1e-6 * max(1.0, abs(pstar))
    # primal iterates agree only up to the optimal-face conditioning of
    # this random fixture (objectives match to 1e-6 above); compare loosely
    xf, yf, *_ = solve_block(prob, mesh=block_mesh(8))
    np.testing.assert_allclose(x, xf, atol=5e-4)
