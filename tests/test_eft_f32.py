"""Pure-f32 error-free transforms — the arithmetic that actually ships on TPU.

tests/test_dd.py runs on the CPU backend, where ops/dd.py routes the three
EFT leaves through exact f64 (`_f64_fallback`), so the pure-f32 Dekker/
Knuth algorithms used on TPU were previously untested in CI.  Here we
disable the fallback and run EAGERLY (each primitive is its own XLA
computation, so the CPU loop emitter's fast-math reassociation cannot cross
op boundaries and the EFT structure survives).  This gives the shipping
TPU arithmetic a regression net; compiled-on-TPU behavior is additionally
exercised by the TPU bench runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD


@pytest.fixture
def pure_f32(monkeypatch):
    """Force the pure-f32 EFT path (what runs on TPU)."""
    monkeypatch.setattr(ddm, "_f64_fallback", lambda: False)


def _rand(seed, n=4096, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.normal(size=n) * scale).astype(np.float32))


def test_two_sum_exact(pure_f32):
    a = _rand(0)
    b = _rand(1, scale=1e-4)
    s, e = ddm.two_sum(a, b)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    # two_sum is error-free: s + e == a + b exactly
    np.testing.assert_array_equal(got, want)


def test_two_prod_exact(pure_f32):
    a = _rand(2)
    b = _rand(3)
    p, e = ddm.two_prod(a, b)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    # f32 x f32 products are exact in f64; Dekker must recover them exactly
    np.testing.assert_array_equal(got, want)


def test_quick_two_sum_exact(pure_f32):
    a = _rand(4)
    b = _rand(5, scale=1e-5)          # |b| << |a| as required
    s, e = ddm.quick_two_sum(a, b)
    got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
    want = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(got, want)


def _dd_rand(seed, n=4096):
    rng = np.random.default_rng(seed)
    x64 = rng.normal(size=n)
    return ddm.from_f64(jnp.asarray(x64)), x64


@pytest.mark.parametrize("op64,opdd", [
    (np.add, ddm.add),
    (np.subtract, ddm.sub),
    (np.multiply, ddm.mul),
    (np.divide, ddm.div),
])
def test_dd_arith_48bit(pure_f32, op64, opdd):
    x, x64 = _dd_rand(10)
    y, y64 = _dd_rand(11)
    if op64 is np.divide:
        y = DD(jnp.abs(y.hi) + 1.0, y.lo)       # keep away from 0
    z = opdd(x, y)
    got = np.asarray(z.hi, np.float64) + np.asarray(z.lo, np.float64)
    want = op64(np.asarray(x.astype_f64()), np.asarray(y.astype_f64()))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel.max() < 2.0 ** -44      # ~2^-48 design point with slack


def test_dd_sqrt_48bit(pure_f32):
    x, _ = _dd_rand(12)
    x = DD(jnp.abs(x.hi) + 0.5, x.lo)
    z = ddm.sqrt(x)
    got = np.asarray(z.hi, np.float64) + np.asarray(z.lo, np.float64)
    want = np.sqrt(np.asarray(x.astype_f64()))
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 2.0 ** -44
