"""Gondzio multiple centrality correctors (config.gondzio_correctors).

The corrector machinery has two testable layers: the spectral clip
(cones.ops/dd_ops.eig_clip_delta — exact zero on in-band blocks, clipped
blocks land inside the band) and the driver integration (same answers,
never-worse step behavior, both carry precisions)."""

import jax
import numpy as np
import pytest

import socp_tpu
from socp_tpu import SolverConfig
from socp_tpu.cones import dd_ops, ops
from socp_tpu.cones.layout import make_layout
from socp_tpu.models.portfolio import portfolio
from socp_tpu.models.random_socp import random_socp
from socp_tpu.ops import dd as ddm
from socp_tpu.problem import ConeDims


def _spectral(layout, v):
    """(eigs, per-block) of a Jordan vector for checking, f64 numpy."""
    v = np.asarray(v, np.float64)
    out = list(v[: layout.l])
    for b in layout.buckets:
        blk = v[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad)
        n1 = np.linalg.norm(blk[:, 1:], axis=1)
        out.extend(blk[:, 0] + n1)
        out.extend(blk[:, 0] - n1)
    return np.asarray(out)


def test_eig_clip_delta_zero_in_band():
    layout = make_layout(ConeDims(l=3, qs=(4, 6)))
    rng = np.random.default_rng(0)
    # interior vector with spectrum safely inside [lo, hi]
    v = np.zeros(layout.m_pad)
    v[:3] = rng.uniform(1.0, 2.0, 3)
    for b in layout.buckets:
        blk = v[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad)
        blk[:, 0] = 3.0
        blk[:, 1] = 1.0           # eigenvalues 2 and 4
    d = np.asarray(ops.eig_clip_delta(layout, v, 0.5, 10.0))
    np.testing.assert_array_equal(d, np.zeros_like(d))
    # dd variant agrees
    ddv = dd_ops.eig_clip_delta(layout, ddm.from_f32(v.astype(np.float32)),
                                0.5, 10.0)
    np.testing.assert_array_equal(np.asarray(ddv.hi), np.zeros(layout.m_pad))


def test_eig_clip_delta_moves_spectrum_into_band():
    layout = make_layout(ConeDims(l=4, qs=(5,)))
    rng = np.random.default_rng(1)
    v = np.zeros(layout.m_pad)
    v[:4] = [1e-6, 0.5, 3.0, 50.0]          # low and high orthant outliers
    b = layout.buckets[0]
    blk = v[b.offset : b.offset + b.size].reshape(b.n_blocks, b.q_pad)
    blk[:, 0] = 10.0
    blk[:, 1] = 9.999                        # eigenvalues ~2e-2 and ~20
    lo, hi = 0.1, 10.0
    d = np.asarray(ops.eig_clip_delta(layout, v, lo, hi))
    eigs = _spectral(layout, v + d)
    assert eigs.min() >= lo - 1e-9
    assert eigs.max() <= hi + 1e-9
    # untouched coordinates stay exactly untouched
    assert d[1] == 0.0 and d[2] == 0.0


@pytest.mark.parametrize("native_dd", [False, True])
def test_gondzio_same_answer(native_dd):
    prob, _ = random_socp(0, n=30, l=8, qs=(5, 9, 13))
    base = SolverConfig(native_dd=native_dd)
    gz = SolverConfig(native_dd=native_dd, gondzio_correctors=2)
    r0 = socp_tpu.solve(prob, config=base)
    r1 = socp_tpu.solve(prob, config=gz)
    assert r0.status_name == r1.status_name == "optimal"
    # the optimal face of this instance is non-unique in x; the objective
    # value and the feasibility/gap measures are the invariants
    np.testing.assert_allclose(r1.pcost, r0.pcost, rtol=1e-7, atol=1e-8)
    assert r1.gap <= 1e-7 and r1.pres <= 1e-7 and r1.dres <= 1e-7
    # the accept rule never lets a corrector shrink the step, so iteration
    # counts cannot regress by more than trace noise
    assert r1.iterations <= r0.iterations + 1


def test_gondzio_portfolio_converges():
    prob, _ = portfolio(seed=7, n=60, k=8)
    r = socp_tpu.solve(prob, config=SolverConfig(gondzio_correctors=2))
    assert r.status_name == "optimal"
    assert r.gap <= 1e-7


def test_gondzio_block_schur_same_answer():
    """The block-Schur driver's corrector (per-block vmapped clip, pmin'd
    accept) must not change the optimum it converges to."""
    from socp_tpu.parallel.mesh import block_mesh
    from socp_tpu.parallel.schur import random_block_problem, solve_block

    prob, _ = random_block_problem(0, K=4, nb=6, p=3)
    mesh = block_mesh(1)
    out0 = solve_block(prob, mesh=mesh,
                       config=SolverConfig(gondzio_correctors=0))
    out1 = solve_block(prob, mesh=mesh,
                       config=SolverConfig(gondzio_correctors=2))
    assert int(out0[4]) == int(out1[4]) == 0          # both OPTIMAL
    np.testing.assert_allclose(out1[6][0], out0[6][0], rtol=1e-7, atol=1e-9)
    assert float(out1[6][2]) <= 1e-7                  # gap
    assert int(out1[5]) <= int(out0[5]) + 1           # never slower


def test_gondzio_hugecone_same_answer():
    """Head/tail-form corrector in the sharded huge-cone driver: same
    optimum, never meaningfully slower."""
    from socp_tpu.parallel.hugecone import solve_huge
    from socp_tpu.parallel.mesh import block_mesh

    rng = np.random.default_rng(5)
    n, l, q = 10, 6, 33
    m = l + q
    G = np.zeros((m, n)); h = np.zeros(m)
    for i in range(l // 2):
        G[2 * i, i] = 1.0; G[2 * i + 1, i] = -1.0
        h[2 * i] = h[2 * i + 1] = 2.0
    a = rng.normal(size=n) * 0.1
    B = rng.normal(size=(q - 1, n)) / np.sqrt(n)
    G[l] = -a; h[l] = 5.0
    G[l + 1:] = -B; h[l + 1:] = -rng.normal(size=q - 1) * 0.1
    c = rng.normal(size=n)
    mesh = block_mesh(1)
    out0 = solve_huge(c, G, h, l, (q,), mesh=mesh,
                      config=SolverConfig(gondzio_correctors=0))
    out1 = solve_huge(c, G, h, l, (q,), mesh=mesh,
                      config=SolverConfig(gondzio_correctors=2))
    assert out0[4].name == out1[4].name == "OPTIMAL"
    np.testing.assert_allclose(out1[6][0], out0[6][0], rtol=1e-6, atol=1e-8)
    assert out1[5] <= out0[5] + 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 faked devices")
def test_gondzio_hugecone_sharded_matches_single():
    """Corrector under the real 8-way tail sharding: the gathered clip
    factors must stay bitwise replicated (check_vma-typed)."""
    from socp_tpu.parallel.hugecone import solve_huge
    from socp_tpu.parallel.mesh import block_mesh

    rng = np.random.default_rng(6)
    n, l, q = 8, 4, 41
    m = l + q
    G = np.zeros((m, n)); h = np.zeros(m)
    for i in range(l // 2):
        G[2 * i, i] = 1.0; G[2 * i + 1, i] = -1.0
        h[2 * i] = h[2 * i + 1] = 2.0
    G[l] = -rng.normal(size=n) * 0.1; h[l] = 5.0
    G[l + 1:] = -rng.normal(size=(q - 1, n)) / np.sqrt(n)
    h[l + 1:] = -rng.normal(size=q - 1) * 0.1
    c = rng.normal(size=n)
    cfg = SolverConfig(gondzio_correctors=1)
    out1 = solve_huge(c, G, h, l, (q,), mesh=block_mesh(1), config=cfg)
    out8 = solve_huge(c, G, h, l, (q,), mesh=block_mesh(8), config=cfg)
    assert out1[4].name == out8[4].name == "OPTIMAL"
    # the orthant pads to a multiple of ndev, so the 1- and 8-device runs
    # carry different padding products; the corrector's accept rule can
    # branch on them, so the TRAJECTORIES (unlike the corrector-free
    # sharded test) legitimately diverge — both land on the optimum, just
    # not bitwise along the same path.  Compare at solution accuracy.
    np.testing.assert_allclose(out8[0], out1[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out8[6][0], out1[6][0], rtol=1e-6, atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 faked devices")
def test_gondzio_block_schur_sharded():
    """Corrector under the REAL 8-device shard_map (psum'd Schur RHS,
    pmin'd accept must be replicated-typed through check_vma)."""
    from socp_tpu.parallel.mesh import block_mesh
    from socp_tpu.parallel.schur import random_block_problem, solve_block

    prob, _ = random_block_problem(1, K=8, nb=6, p=3)
    cfg = SolverConfig(gondzio_correctors=1)
    out1 = solve_block(prob, mesh=block_mesh(1), config=cfg)
    out8 = solve_block(prob, mesh=block_mesh(8), config=cfg)
    assert int(out1[4]) == int(out8[4]) == 0
    np.testing.assert_allclose(out8[6][:3], out1[6][:3], rtol=1e-6,
                               atol=1e-9)
