"""dd32 arithmetic + Ozaki GEMM vs f64 ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD
from socp_tpu.ops.ozaki import dd_matmul, dd_matvec


def _rand(rng, shape, spread=3.0):
    return rng.normal(size=shape) * np.exp(rng.normal(size=shape) * spread)


def test_dd_elementwise_vs_f64():
    rng = np.random.default_rng(0)
    a64 = _rand(rng, 20000)
    b64 = _rand(rng, 20000)
    x = ddm.from_f64(jnp.asarray(a64))
    y = ddm.from_f64(jnp.asarray(b64))

    @jax.jit
    def ops(xh, xl, yh, yl):
        x, y = DD(xh, xl), DD(yh, yl)
        return (ddm.add(x, y), ddm.mul(x, y), ddm.div(x, y),
                ddm.sqrt(ddm.mul(x, x)))

    s, m, d, q = ops(x.hi, x.lo, y.hi, y.lo)
    scale = np.maximum(np.abs(a64), np.abs(b64))
    # absolute error relative to operand scale (dd precision ~2^-48;
    # cancellation makes result-relative error unbounded, as in any FP)
    assert np.max(np.abs(s.astype_f64() - (a64 + b64)) / scale) < 1e-13
    assert np.max(np.abs(m.astype_f64() - a64 * b64) / np.abs(a64 * b64)) < 1e-12
    assert np.max(np.abs(d.astype_f64() - a64 / b64) / np.abs(a64 / b64)) < 1e-12
    assert np.max(np.abs(q.astype_f64() - np.abs(a64)) / np.abs(a64)) < 1e-12


def test_dd_roundtrip():
    rng = np.random.default_rng(1)
    a64 = _rand(rng, 1000)
    x = ddm.from_f64(jnp.asarray(a64))
    np.testing.assert_allclose(np.asarray(x.astype_f64()), a64, rtol=1e-14)


@pytest.mark.parametrize("shape", [(40, 60, 30), (130, 90, 70)])
def test_ozaki_matmul_vs_f64(shape):
    p, m, q = shape
    rng = np.random.default_rng(2)
    A64 = _rand(rng, (p, m), spread=2.0)
    B64 = _rand(rng, (m, q), spread=2.0)
    A = ddm.from_f64(jnp.asarray(A64))
    B = ddm.from_f64(jnp.asarray(B64))
    C = jax.jit(dd_matmul)(A, B)
    ref = A64 @ B64
    # row/col scale for the error normalization (Ozaki accuracy contract)
    scale = np.outer(np.max(np.abs(A64), 1), np.max(np.abs(B64), 0)) * m
    err = np.max(np.abs(C.astype_f64() - ref) / scale)
    assert err < 1e-13, err


def test_ozaki_gram_illconditioned():
    """The solver's actual use: Gram matrix of a badly scaled Ghat."""
    rng = np.random.default_rng(3)
    m, n = 300, 64
    # rows scaled like an IPM W^-1 G near convergence: 1e-4 .. 1e4
    Ghat64 = rng.normal(size=(m, n)) * np.exp(
        rng.uniform(-9, 9, size=(m, 1))
    )
    G = ddm.from_f64(jnp.asarray(Ghat64))
    H = jax.jit(lambda a, b: dd_matmul(a, b))(G.T, G)
    ref = Ghat64.T @ Ghat64
    scale = np.outer(
        np.linalg.norm(Ghat64, axis=0), np.linalg.norm(Ghat64, axis=0)
    )
    err = np.max(np.abs(H.astype_f64() - ref) / scale)
    assert err < 1e-12, err


def test_ozaki_chunked_contraction():
    """m > MAX_CONTRACT path (chunk + dd-sum)."""
    rng = np.random.default_rng(4)
    m = 3000
    A64 = rng.normal(size=(8, m))
    B64 = rng.normal(size=(m, 8))
    C = jax.jit(dd_matmul)(ddm.from_f64(jnp.asarray(A64)),
                           ddm.from_f64(jnp.asarray(B64)))
    err = np.max(np.abs(C.astype_f64() - A64 @ B64)) / m
    assert err < 1e-12, err


def test_ozaki_presliced_chunked():
    """sliced_gram / sliced_matmul with contraction > MAX_CONTRACT: the
    presliced KKT pipeline (kkt/dd_dense.py) must handle m_pad > 2048
    (regression: these used to hard-assert m <= 2048)."""
    from socp_tpu.ops.ozaki import preslice, sliced_gram, sliced_matmul

    rng = np.random.default_rng(6)
    m = 2600
    M64 = rng.normal(size=(16, m)) * np.exp(rng.uniform(-3, 3, size=(16, 1)))
    Ms = preslice(ddm.from_f64(jnp.asarray(M64)))
    H = jax.jit(sliced_gram)(Ms)
    refH = M64 @ M64.T
    scale = np.outer(np.linalg.norm(M64, axis=1), np.linalg.norm(M64, axis=1))
    assert np.max(np.abs(H.astype_f64() - refH) / scale) < 1e-12

    x64 = rng.normal(size=(m, 3))
    y = jax.jit(sliced_matmul)(Ms, ddm.from_f64(jnp.asarray(x64)))
    refy = M64 @ x64
    sc = np.abs(M64).max(1, keepdims=True) * np.abs(x64).max(0) * m
    assert np.max(np.abs(y.astype_f64() - refy) / sc) < 1e-13


def test_ozaki_matvec():
    rng = np.random.default_rng(5)
    A64 = rng.normal(size=(50, 80))
    x64 = rng.normal(size=80)
    y = jax.jit(dd_matvec)(ddm.from_f64(jnp.asarray(A64)),
                           ddm.from_f64(jnp.asarray(x64)))
    np.testing.assert_allclose(np.asarray(y.astype_f64()), A64 @ x64,
                               rtol=1e-12, atol=1e-12)


def test_blocked_cholesky_matches_unblocked():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops.dd_linalg import dd_cholesky, dd_cholesky_blocked

    rng = np.random.default_rng(5)
    for n in (24, 70):  # > and < one block
        Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
        ev = np.logspace(-8, 0, n)
        H64 = (Q * ev) @ Q.T
        H64 = (H64 + H64.T) / 2
        H = ddm.from_f64(jnp.asarray(H64))
        Lb = jax.jit(lambda h: dd_cholesky_blocked(h, block=32))(H)
        ref = np.linalg.cholesky(H64)
        err = np.abs(np.asarray(Lb.astype_f64()) - ref).max()
        assert err / np.abs(ref).max() < 1e-9
