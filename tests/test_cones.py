"""JAX cone kernels vs the NumPy oracle (differential tests on the padded
layout): jprod/jdiv/lambda_min/max_step/NT scaling must agree with the
executable spec for random interior points and heterogeneous cone mixes.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from socp_tpu.cones import ops as cops
from socp_tpu.cones.layout import make_layout
from socp_tpu.problem import ConeDims
from socp_tpu.utils import oracle


CASES = [
    ConeDims(l=5, qs=(2, 3, 7)),
    ConeDims(l=0, qs=(4, 4, 9, 17)),
    ConeDims(l=7, qs=()),
    ConeDims(l=3, qs=(1, 2, 25)),    # dim-1 SOC + mixed buckets
]


def _interior(rng, dims):
    u = rng.normal(size=dims.dim)
    u[: dims.l] = np.abs(u[: dims.l]) + 0.5
    for sl in dims.soc_slices():
        u[sl.start] = np.linalg.norm(u[sl.start + 1 : sl.stop]) + rng.uniform(
            0.3, 1.5
        )
    return u


@pytest.mark.parametrize("dims", CASES)
def test_layout_roundtrip(dims):
    layout = make_layout(dims)
    rng = np.random.default_rng(0)
    v = rng.normal(size=dims.dim)
    np.testing.assert_array_equal(layout.unpad_vec(layout.pad_vec(v)), v)
    M = rng.normal(size=(dims.dim, 4))
    Mp = layout.pad_rows(M)
    assert Mp.shape == (layout.m_pad, 4)
    np.testing.assert_array_equal(Mp[layout.perm_np], M)
    # padding rows are zero
    mask = np.ones(layout.m_pad, bool)
    mask[layout.perm_np] = False
    assert np.all(Mp[mask] == 0)


@pytest.mark.parametrize("dims", CASES)
def test_cone_ops_match_oracle(dims):
    layout = make_layout(dims)
    rng = np.random.default_rng(1)
    for _ in range(5):
        u = _interior(rng, dims)
        v = _interior(rng, dims)
        d = rng.normal(size=dims.dim)
        up, vp, dp = (jnp.asarray(layout.pad_vec(a)) for a in (u, v, d))

        np.testing.assert_allclose(
            layout.unpad_vec(np.asarray(cops.jprod(layout, up, vp))),
            oracle.jprod(dims, u, v), atol=1e-12,
        )
        np.testing.assert_allclose(
            layout.unpad_vec(np.asarray(cops.jdiv(layout, up, vp))),
            oracle.jdiv(dims, u, v), atol=1e-10,
        )
        np.testing.assert_allclose(
            float(cops.lambda_min(layout, up)), oracle.lambda_min(dims, u),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            float(cops.max_step(layout, up, dp)), oracle.max_step(dims, u, d),
            rtol=1e-10,
        )


@pytest.mark.parametrize("dims", CASES)
def test_nt_scaling_matches_oracle(dims):
    layout = make_layout(dims)
    rng = np.random.default_rng(2)
    for _ in range(5):
        s = _interior(rng, dims)
        z = _interior(rng, dims)
        u = rng.normal(size=dims.dim)
        sp, zp, up = (jnp.asarray(layout.pad_vec(a)) for a in (s, z, u))
        sc_j = cops.nt_scale(layout, sp, zp)
        sc_o = oracle.NTScaling(dims, s, z)
        np.testing.assert_allclose(
            layout.unpad_vec(np.asarray(sc_j.lam)), sc_o.lam, rtol=1e-10
        )
        np.testing.assert_allclose(
            layout.unpad_vec(np.asarray(cops.apply_W(layout, sc_j, up))),
            sc_o.apply_W(u), rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            layout.unpad_vec(np.asarray(cops.apply_Winv(layout, sc_j, up))),
            sc_o.apply_Winv(u), rtol=1e-10, atol=1e-12,
        )


@pytest.mark.parametrize("dims", CASES)
def test_scale_rows_matches_apply(dims):
    """W^-1 G column-by-column equals the matrix kernel."""
    layout = make_layout(dims)
    rng = np.random.default_rng(3)
    s = _interior(rng, dims)
    z = _interior(rng, dims)
    sc = cops.nt_scale(
        layout, jnp.asarray(layout.pad_vec(s)), jnp.asarray(layout.pad_vec(z))
    )
    n = 6
    G = jnp.asarray(layout.pad_rows(rng.normal(size=(dims.dim, n))))
    Ghat = np.asarray(cops.scale_rows_Winv(layout, sc, G))
    for j in range(n):
        np.testing.assert_allclose(
            Ghat[:, j], np.asarray(cops.apply_Winv(layout, sc, G[:, j])),
            rtol=1e-10, atol=1e-12,
        )


def test_identity_scaling_is_identity():
    layout = make_layout(ConeDims(l=4, qs=(3, 6)))
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=layout.m_pad))
    sc = cops.identity_scaling(layout, jnp.float64)
    np.testing.assert_allclose(np.asarray(cops.apply_W(layout, sc, u)), u,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(cops.apply_Winv(layout, sc, u)), u,
                               atol=1e-14)


def test_dim1_soc_blocks():
    """A dim-1 SOC is the halfline u0 >= 0; both solvers must handle it
    (degenerate Jordan frame: u1 empty, det(u) = u0^2)."""
    import numpy as np

    from socp_tpu import solve
    from socp_tpu.models.random_socp import random_socp
    from socp_tpu.utils import oracle

    prob, known = random_socp(0, n=14, l=8, qs=(1, 3, 5), p=2)
    ro = oracle.solve(prob.c, prob.G, prob.h, prob.dims, A=prob.A, b=prob.b)
    assert ro["status_name"] == "optimal"
    r = solve(prob)
    assert r.status.name == "OPTIMAL"
    assert abs(r.pcost - known.pcost) <= 1e-6 * max(1.0, abs(known.pcost))
