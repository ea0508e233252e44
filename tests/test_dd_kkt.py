"""kkt/dd_dense structured (rank-correction) vs scaled-matrix assembly.

factor_dd assembles H = P_aug + G' W^-2 G two ways: STRUCTURED (constant
presliced G + winv2_rho/winv2_columns rank correction) when the preslices
are passed and the SOC-block count is small, and the scaled-matrix
fallback (W^-1 G formed and presliced afresh) otherwise.  Both must give
the same back-solves to dd accuracy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from socp_tpu.cones import dd_ops
from socp_tpu.cones.layout import make_layout
from socp_tpu.kkt import dd_dense
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.ozaki import preslice
from socp_tpu.problem import ConeDims

from tests.test_dd_cones import _interior


@pytest.mark.parametrize("dims,p", [
    (ConeDims(l=5, qs=(2, 3, 7)), 0),
    (ConeDims(l=0, qs=(4, 9, 17)), 3),
    (ConeDims(l=3, qs=(1, 2, 25)), 2),
])
def test_structured_factor_matches_fallback(dims, p):
    layout = make_layout(dims)
    rng = np.random.default_rng(11)
    n = 8
    m = layout.m_pad
    s = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims))))
    z = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims))))
    G = ddm.from_f64(jnp.asarray(layout.pad_rows(
        rng.normal(size=(dims.dim, n)))))
    A = ddm.from_f64(jnp.asarray(rng.normal(size=(p, n))))
    sc = dd_ops.nt_scale(layout, s, z)

    k_str = dd_dense.factor_dd(layout, sc, None, A, G, 1e-12,
                               GT_s=preslice(G.T), G_s=preslice(G))
    k_fb = dd_dense.factor_dd(layout, sc, None, A, G, 1e-12)
    assert isinstance(k_str, dd_dense.DDKKTn)
    assert isinstance(k_fb, dd_dense.DDKKTo)

    bx = ddm.from_f64(jnp.asarray(rng.normal(size=n)))
    by = ddm.from_f64(jnp.asarray(rng.normal(size=p)))
    bz = ddm.from_f64(jnp.asarray(rng.normal(size=m)))
    dx1, dy1, dz1 = dd_dense.solve_dd(layout, k_str, A, bx, by, bz)
    dx2, dy2, dz2 = dd_dense.solve_dd(layout, k_fb, A, bx, by, bz)
    sc_x = max(1.0, float(np.abs(dx2.astype_f64()).max()))
    np.testing.assert_allclose(np.asarray(dx1.astype_f64()),
                               np.asarray(dx2.astype_f64()),
                               rtol=1e-8, atol=1e-9 * sc_x)
    if p:
        np.testing.assert_allclose(np.asarray(dy1.astype_f64()),
                                   np.asarray(dy2.astype_f64()),
                                   rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dz1.astype_f64()),
                               np.asarray(dz2.astype_f64()),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("dims,p", [
    (ConeDims(l=5, qs=(2, 3, 7)), 0),
    (ConeDims(l=0, qs=(4, 9, 17)), 3),
])
def test_inverse_apply_matches_substitution(dims, p):
    """factor_dd(invert=True) (explicit dd triangular inverse, applied as
    two Ozaki matvecs) must reproduce the substitution back-solve to dd
    accuracy — forward error of both is O(eps_dd * kappa)."""
    layout = make_layout(dims)
    rng = np.random.default_rng(13)
    n = 8
    m = layout.m_pad
    s = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims))))
    z = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims))))
    G = ddm.from_f64(jnp.asarray(layout.pad_rows(
        rng.normal(size=(dims.dim, n)))))
    A = ddm.from_f64(jnp.asarray(rng.normal(size=(p, n))))
    sc = dd_ops.nt_scale(layout, s, z)

    k_inv = dd_dense.factor_dd(layout, sc, None, A, G, 1e-12, invert=True)
    k_sub = dd_dense.factor_dd(layout, sc, None, A, G, 1e-12)
    assert isinstance(k_inv.L_H, dd_dense.DDEqCholInv)

    bx = ddm.from_f64(jnp.asarray(rng.normal(size=n)))
    by = ddm.from_f64(jnp.asarray(rng.normal(size=p)))
    bz = ddm.from_f64(jnp.asarray(rng.normal(size=m)))
    dx1, dy1, dz1 = dd_dense.solve_dd(layout, k_inv, A, bx, by, bz)
    dx2, dy2, dz2 = dd_dense.solve_dd(layout, k_sub, A, bx, by, bz)
    for a, b in [(dx1, dx2), (dy1, dy2), (dz1, dz2)]:
        if b.hi.size == 0:
            continue
        sc_ = max(1.0, float(np.abs(b.astype_f64()).max()))
        np.testing.assert_allclose(np.asarray(a.astype_f64()),
                                   np.asarray(b.astype_f64()),
                                   rtol=1e-8, atol=1e-9 * sc_)


@pytest.mark.parametrize("dims,p", [
    (ConeDims(l=0, qs=(9, 17)), 0),           # pure-SOC (c3 contract shape)
    (ConeDims(l=5, qs=(2, 3, 7)), 0),         # orthant + 3 SOCs
    (ConeDims(l=3, qs=(1, 2, 25)), 2),        # + equalities
])
def test_const_gram_factor_matches_fallback(dims, p):
    """The ConstGram assembly (per-block constant Grams + rank-2NB update,
    zero per-iteration Ozaki passes over the full G) must reproduce the
    scaled-matrix fallback's back-solves to dd accuracy."""
    layout = make_layout(dims)
    rng = np.random.default_rng(19)
    n = 8
    m = layout.m_pad
    s = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims))))
    z = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims))))
    G = ddm.from_f64(jnp.asarray(layout.pad_rows(
        rng.normal(size=(dims.dim, n)))))
    A = ddm.from_f64(jnp.asarray(rng.normal(size=(p, n))))
    sc = dd_ops.nt_scale(layout, s, z)

    cg = dd_dense.precompute_const_gram(layout, G)
    assert cg is not None
    k_cg = dd_dense.factor_dd(layout, sc, None, A, G, 1e-12,
                              GT_s=preslice(G.T), G_s=preslice(G), cg=cg)
    k_fb = dd_dense.factor_dd(layout, sc, None, A, G, 1e-12)
    assert isinstance(k_cg, dd_dense.DDKKTn)

    bx = ddm.from_f64(jnp.asarray(rng.normal(size=n)))
    by = ddm.from_f64(jnp.asarray(rng.normal(size=p)))
    bz = ddm.from_f64(jnp.asarray(rng.normal(size=m)))
    dx1, dy1, dz1 = dd_dense.solve_dd(layout, k_cg, A, bx, by, bz)
    dx2, dy2, dz2 = dd_dense.solve_dd(layout, k_fb, A, bx, by, bz)
    for a, b in [(dx1, dx2), (dy1, dy2), (dz1, dz2)]:
        if b.hi.size == 0:
            continue
        sc_ = max(1.0, float(np.abs(b.astype_f64()).max()))
        np.testing.assert_allclose(np.asarray(a.astype_f64()),
                                   np.asarray(b.astype_f64()),
                                   rtol=1e-8, atol=1e-9 * sc_)


def test_const_gram_gate():
    """precompute_const_gram declines layouts it can't help: no SOC blocks,
    or more than CONST_GRAM_MAX_BLOCKS of them (memory gate)."""
    rng = np.random.default_rng(23)
    for dims in (ConeDims(l=6, qs=()),
                 ConeDims(l=0, qs=(3,) * (dd_dense.CONST_GRAM_MAX_BLOCKS + 1))):
        layout = make_layout(dims)
        G = ddm.from_f64(jnp.asarray(layout.pad_rows(
            rng.normal(size=(dims.dim, 4)))))
        assert dd_dense.precompute_const_gram(layout, G) is None


def test_dd_tri_inv_identity():
    """dd_tri_inv at several sizes (padding + recursion levels): L Linv = I."""
    from socp_tpu.ops.dd_linalg import dd_cholesky_blocked, dd_tri_inv

    rng = np.random.default_rng(17)
    for n in (5, 32, 47, 70, 130):
        A = rng.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)
        L = dd_cholesky_blocked(ddm.from_f64(jnp.asarray(H)))
        Linv = dd_tri_inv(L)
        P = np.asarray(L.astype_f64())
        Pi = np.asarray(Linv.astype_f64())
        assert np.abs(P @ Pi - np.eye(n)).max() < 1e-12


def test_dd_chol_tri_inv_identity():
    """dd_chol_tri_inv (fused panel Cholesky + base inversion): the
    returned Linv satisfies H (Linv' Linv) = I to dd accuracy at sizes
    covering the padding/level cases."""
    from socp_tpu.ops.dd_linalg import dd_chol_tri_inv

    rng = np.random.default_rng(29)
    for n in (5, 32, 47, 70, 102, 130):
        A = rng.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)
        Linv = np.asarray(dd_chol_tri_inv(
            ddm.from_f64(jnp.asarray(H))).astype_f64())
        E = H @ (Linv.T @ Linv) - np.eye(n)
        assert np.abs(E).max() < 1e-11, (n, np.abs(E).max())
