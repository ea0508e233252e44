"""dd32 cone kernels vs the f64 jnp cone kernels (differential)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socp_tpu.cones import dd_ops, ops as cops
from socp_tpu.cones.layout import make_layout
from socp_tpu.ops import dd as ddm
from socp_tpu.problem import ConeDims

CASES = [
    ConeDims(l=5, qs=(2, 3, 7)),
    ConeDims(l=0, qs=(4, 9, 17)),
    ConeDims(l=3, qs=(1, 2, 25)),
]


def _interior(rng, dims, mu=1.0):
    u = rng.normal(size=dims.dim)
    u[: dims.l] = np.abs(u[: dims.l]) + mu
    for sl in dims.soc_slices():
        u[sl.start] = np.linalg.norm(u[sl.start + 1 : sl.stop]) + mu * (
            1 + rng.random()
        )
    return u


@pytest.mark.parametrize("dims", CASES)
@pytest.mark.parametrize("mu", [1.0, 1e-6])
def test_dd_cone_ops_match_f64(dims, mu):
    """mu=1e-6 exercises near-boundary cancellation (dets ~ mu^2)."""
    layout = make_layout(dims)
    rng = np.random.default_rng(0)
    u64 = layout.pad_vec(_interior(rng, dims, mu))
    v64 = layout.pad_vec(_interior(rng, dims, mu))
    d64 = layout.pad_vec(rng.normal(size=dims.dim))
    uj, vj, dj = (jnp.asarray(a) for a in (u64, v64, d64))
    ud, vd, dd_ = (ddm.from_f64(a) for a in (uj, vj, dj))

    atol = 1e-11 * max(1.0, 1.0 / mu)
    np.testing.assert_allclose(
        np.asarray(dd_ops.jprod(layout, ud, vd).astype_f64()),
        np.asarray(cops.jprod(layout, uj, vj)), atol=atol, rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(dd_ops.jdiv(layout, ud, dd_).astype_f64()),
        np.asarray(cops.jdiv(layout, uj, dj)), atol=atol, rtol=1e-7,
    )
    np.testing.assert_allclose(
        float(dd_ops.lambda_min(layout, ud)),
        float(cops.lambda_min(layout, uj)), rtol=2e-6, atol=1e-9,
    )
    a_dd = float(dd_ops.max_step(layout, ud, dd_))
    a_64 = float(cops.max_step(layout, uj, dj))
    if np.isinf(a_64):
        assert np.isinf(a_dd)
    else:
        np.testing.assert_allclose(a_dd, a_64, rtol=2e-5)


@pytest.mark.parametrize("dims", CASES)
@pytest.mark.parametrize("mu", [1.0, 1e-5])
def test_dd_nt_scaling_matches_f64(dims, mu):
    layout = make_layout(dims)
    rng = np.random.default_rng(1)
    s64 = layout.pad_vec(_interior(rng, dims, mu))
    z64 = layout.pad_vec(_interior(rng, dims, mu))
    u64 = layout.pad_vec(rng.normal(size=dims.dim))
    sj, zj, uj = (jnp.asarray(a) for a in (s64, z64, u64))
    sd, zd, ud = (ddm.from_f64(a) for a in (sj, zj, uj))

    sc64 = cops.nt_scale(layout, sj, zj)
    scdd = dd_ops.nt_scale(layout, sd, zd)
    np.testing.assert_allclose(
        np.asarray(scdd.lam.astype_f64()), np.asarray(sc64.lam),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(dd_ops.apply_W(layout, scdd, ud).astype_f64()),
        np.asarray(cops.apply_W(layout, sc64, uj)), rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(dd_ops.apply_Winv(layout, scdd, ud).astype_f64()),
        np.asarray(cops.apply_Winv(layout, sc64, uj)), rtol=1e-8, atol=1e-10,
    )
    # NT identity in dd: W z = W^-1 s = lam
    wz = dd_ops.apply_W(layout, scdd, zd)
    np.testing.assert_allclose(
        np.asarray(wz.astype_f64()), np.asarray(scdd.lam.astype_f64()),
        rtol=1e-9, atol=1e-11,
    )


@pytest.mark.parametrize("dims", CASES)
def test_dd_scale_rows(dims):
    layout = make_layout(dims)
    rng = np.random.default_rng(2)
    s64 = layout.pad_vec(_interior(rng, dims))
    z64 = layout.pad_vec(_interior(rng, dims))
    G64 = layout.pad_rows(rng.normal(size=(dims.dim, 6)))
    sc64 = cops.nt_scale(layout, jnp.asarray(s64), jnp.asarray(z64))
    scdd = dd_ops.nt_scale(layout, ddm.from_f64(jnp.asarray(s64)),
                           ddm.from_f64(jnp.asarray(z64)))
    Gh64 = cops.scale_rows_Winv(layout, sc64, jnp.asarray(G64))
    Ghdd = dd_ops.scale_rows_Winv(layout, scdd, ddm.from_f64(jnp.asarray(G64)))
    np.testing.assert_allclose(
        np.asarray(Ghdd.astype_f64()), np.asarray(Gh64), rtol=1e-9, atol=1e-11
    )


def test_dd_sum_accuracy():
    """Pairwise dd reduction beats naive f32 on a cancelling series."""
    rng = np.random.default_rng(3)
    big = rng.normal(size=500) * 1e4
    x64 = np.concatenate([big, -big, rng.normal(size=37) * 1e-6])
    rng.shuffle(x64)
    x = ddm.from_f64(jnp.asarray(x64))
    got = float(dd_ops.dd_sum(x, axis=0).astype_f64())
    # bound: the dd32 *representation* of the inputs already carries
    # sum(|x|) * 2^-49 of error; the pairwise reduction adds ~log2(n) ulps
    assert abs(got - x64.sum()) < np.sum(np.abs(x64)) * 2.0**-49 * 20


@pytest.mark.parametrize("dims", CASES)
@pytest.mark.parametrize("mu", [1.0, 1e-5])
def test_dd_fused_W2_matches_double_apply(dims, mu):
    """apply_W2 / apply_Winv2 (one fused P(wbar) pass) == applying W twice."""
    layout = make_layout(dims)
    rng = np.random.default_rng(7)
    sd = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims, mu))))
    zd = ddm.from_f64(jnp.asarray(layout.pad_vec(_interior(rng, dims, mu))))
    ud = ddm.from_f64(jnp.asarray(layout.pad_vec(rng.normal(size=dims.dim))))
    sc = dd_ops.nt_scale(layout, sd, zd)
    ww = dd_ops.apply_W(layout, sc, dd_ops.apply_W(layout, sc, ud))
    w2 = dd_ops.apply_W2(layout, sc, ud)
    np.testing.assert_allclose(
        np.asarray(w2.astype_f64()), np.asarray(ww.astype_f64()),
        rtol=1e-9, atol=1e-11,
    )
    wwi = dd_ops.apply_Winv(layout, sc, dd_ops.apply_Winv(layout, sc, ud))
    w2i = dd_ops.apply_Winv2(layout, sc, ud)
    np.testing.assert_allclose(
        np.asarray(w2i.astype_f64()), np.asarray(wwi.astype_f64()),
        rtol=1e-9, atol=1e-11,
    )
    # round trip: W^2 (W^-2 u) == u.  Error scales with kappa(W^2)^2 ~ mu^-2
    # (the scaling's dynamic range grows as the iterate approaches the
    # boundary), so the tolerance must carry the same factor.
    rt = dd_ops.apply_W2(layout, sc, w2i)
    tol = 1e-9 / min(mu, 1.0) ** 2
    np.testing.assert_allclose(
        np.asarray(rt.astype_f64()), np.asarray(ud.astype_f64()),
        rtol=tol, atol=tol * 1e-2,
    )


@pytest.mark.parametrize("dims", CASES)
def test_dd_structured_winv2_assembly_identity(dims):
    """G' W^-2 G == G' diag(rho) G + (G'V) diag(w2) (G'V)'  (the structured
    KKT assembly of kkt/dd_dense.factor_dd), checked against the f64
    scaled-matrix Gram."""
    layout = make_layout(dims)
    rng = np.random.default_rng(8)
    nvar = 6
    s64 = layout.pad_vec(_interior(rng, dims))
    z64 = layout.pad_vec(_interior(rng, dims))
    G64 = layout.pad_rows(rng.normal(size=(dims.dim, nvar)))
    sc64 = cops.nt_scale(layout, jnp.asarray(s64), jnp.asarray(z64))
    Gh64 = np.asarray(cops.scale_rows_Winv(layout, sc64, jnp.asarray(G64)))
    ref = Gh64.T @ Gh64

    scdd = dd_ops.nt_scale(layout, ddm.from_f64(jnp.asarray(s64)),
                           ddm.from_f64(jnp.asarray(z64)))
    Gdd = ddm.from_f64(jnp.asarray(G64))
    rho = dd_ops.winv2_rho(layout, scdd)
    H = np.asarray(
        (Gdd.T.astype_f64() @ (rho.astype_f64()[:, None] * Gdd.astype_f64()))
    )
    V, w2 = dd_ops.winv2_columns(layout, scdd)
    if w2 is not None:
        U = Gdd.astype_f64().T @ V.astype_f64()
        H = H + (U * w2.astype_f64()[None, :]) @ U.T
    np.testing.assert_allclose(H, ref, rtol=1e-9, atol=1e-11)
