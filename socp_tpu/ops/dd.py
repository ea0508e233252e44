"""Double-word float32 ("dd32") arithmetic — TPU-native ~2^-48 precision.

TPU MXU/VPU have no fast f64; XLA's emulation is ~100x slower than f32 for
the solver's factor pipeline (measured, see kkt/dense.py).  This module
implements classic double-double arithmetic (Dekker/Bailey/QD-library
algorithms) specialized to f32 pairs: a value is (hi, lo) with
|lo| <= ulp(hi)/2, giving ~48-bit effective mantissa — enough to factor
IPM KKT systems with kappa up to ~1e12 and certify 1e-8 duality gaps.

All functions are branch-free elementwise jnp ops (VPU-friendly, work under
vmap/jit and inside Pallas kernels).  Error-free transformations rely on
IEEE round-to-nearest and on XLA not reassociating float arithmetic
(default behavior; verified by tests/test_dd.py against f64).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for f32's 24-bit mantissa


import threading

_barrier_state = threading.local()


@functools.cache
def _tpu_backend() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _ob(x):
    """Optimization barrier: XLA's algebraic simplifier (notably on the CPU
    backend) rewrites float patterns like (a+b)-a -> b, which silently
    destroys error-free transformations.  Marking the pivot intermediates
    opaque blocks those rewrites at zero runtime cost; verified necessary
    on the CPU backend (tests/test_dd.py).

    On the TPU backend the barriers are SKIPPED: XLA-TPU's pipeline was
    verified bit-exact barrier-free (hi and lo words identical over 20k
    adversarial-magnitude values through a fused add/mul/sub/div/sqrt dd
    chain, and two_sum exactness holds), and the barriers are far from
    free there — each one splits the fusion, so every dd op becomes its
    own kernel launch (~100+ extra kernels per IPM iteration on the
    batched path)."""
    if getattr(_barrier_state, "free", False) or _tpu_backend():
        return x
    return jax.lax.optimization_barrier(x)


class barrier_free:
    """Trace dd arithmetic WITHOUT optimization barriers.

    For use while tracing Pallas TPU kernel bodies only: Mosaic cannot
    lower optimization_barrier, but (unlike the XLA CPU loop emitter) its
    MLIR pipeline does not re-associate float arithmetic, so the raw
    Knuth/Dekker transforms compile exactly — verified on hardware
    (scripts/pallas_probe.py: two_sum/two_prod bit-exact vs f64).

    The flag is thread-local so concurrent tracing on other threads keeps
    its barriers.
    """

    def __enter__(self):
        self._saved = getattr(_barrier_state, "free", False)
        _barrier_state.free = True

    def __exit__(self, *exc):
        _barrier_state.free = self._saved
        return False


@functools.cache
def _f64_fallback() -> bool:
    """The XLA *CPU* backend's vectorized loop emitter applies
    reassociation-grade fast-math that no xla_cpu flag disables (verified
    empirically: the HLO keeps the error-free transformation structure, the
    compiled loop does not).  On CPU we therefore implement the three EFT
    leaves exactly via f64 (available and fast there); the TPU backend
    compiles the pure-f32 EFTs correctly and has no fast f64."""
    try:
        return jax.default_backend() == "cpu" and jax.config.jax_enable_x64
    except Exception:
        return False


class DD(NamedTuple):
    """A double-word f32 array (pytree)."""

    hi: jax.Array
    lo: jax.Array

    @property
    def shape(self):
        return self.hi.shape

    @property
    def T(self) -> "DD":
        return DD(self.hi.T, self.lo.T)

    def __getitem__(self, idx) -> "DD":
        return DD(self.hi[idx], self.lo[idx])

    def astype_f64(self) -> jax.Array:
        return self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)

    def neg(self) -> "DD":
        return DD(-self.hi, -self.lo)

    def reshape(self, *shape) -> "DD":
        return DD(self.hi.reshape(*shape), self.lo.reshape(*shape))


def from_f32(x: jax.Array) -> DD:
    return DD(x, jnp.zeros_like(x))


def from_f64(x: jax.Array) -> DD:
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return DD(hi, lo)


def two_sum(a, b):
    """Error-free a + b = s + err."""
    if _f64_fallback():
        s64 = a.astype(jnp.float64) + b.astype(jnp.float64)
        s = s64.astype(jnp.float32)
        return s, (s64 - s.astype(jnp.float64)).astype(jnp.float32)
    s = _ob(a + b)
    bb = _ob(s - a)
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    """Error-free a + b = s + err, assuming |a| >= |b|."""
    if _f64_fallback():
        return two_sum(a, b)
    s = _ob(a + b)
    return s, b - (s - a)


def _split(a):
    t = _ob(_SPLITTER * a)
    u = _ob(t - a)
    hi = t - u
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b = p + err (Dekker; no FMA assumed)."""
    if _f64_fallback():
        p64 = a.astype(jnp.float64) * b.astype(jnp.float64)  # exact
        p = p64.astype(jnp.float32)
        return p, (p64 - p.astype(jnp.float64)).astype(jnp.float32)
    p = _ob(a * b)
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(x: DD, y: DD) -> DD:
    """Accurate dd + dd (Bailey's ieee_add)."""
    sh, sl = two_sum(x.hi, y.hi)
    th, tl = two_sum(x.lo, y.lo)
    sl = sl + th
    sh, sl = quick_two_sum(sh, sl)
    sl = sl + tl
    sh, sl = quick_two_sum(sh, sl)
    return DD(sh, sl)


def sub(x: DD, y: DD) -> DD:
    return add(x, y.neg())


def add_f32(x: DD, b: jax.Array) -> DD:
    sh, sl = two_sum(x.hi, b)
    sl = sl + x.lo
    return DD(*quick_two_sum(sh, sl))


def mul(x: DD, y: DD) -> DD:
    ph, pl = two_prod(x.hi, y.hi)
    pl = pl + (x.hi * y.lo + x.lo * y.hi)
    return DD(*quick_two_sum(ph, pl))


def mul_f32(x: DD, b: jax.Array) -> DD:
    ph, pl = two_prod(x.hi, b)
    pl = pl + x.lo * b
    return DD(*quick_two_sum(ph, pl))


def div(x: DD, y: DD) -> DD:
    q1 = x.hi / y.hi
    r = sub(x, mul_f32(y, q1))
    q2 = r.hi / y.hi
    r = sub(r, mul_f32(y, q2))
    q3 = r.hi / y.hi
    qh, ql = quick_two_sum(q1, q2)
    return add_f32(DD(qh, ql), q3)


def sqrt(x: DD) -> DD:
    """dd sqrt via one Karp-Markstein style correction."""
    a = jnp.sqrt(x.hi)
    # guard against zero (padding lanes): sqrt(0) = 0
    safe = jnp.where(a > 0, a, 1.0)
    # r = (x - a^2) / (2a);  sqrt(x) ~ a + r
    a_dd = DD(safe, jnp.zeros_like(safe))
    diff = sub(x, mul(a_dd, a_dd))
    r = diff.hi / (2.0 * safe)
    out = add_f32(a_dd, r)
    zero = jnp.zeros_like(a)
    return DD(jnp.where(a > 0, out.hi, zero), jnp.where(a > 0, out.lo, zero))


def rsqrt(x: DD) -> DD:
    return div(from_f32(jnp.ones_like(x.hi)), sqrt(x))


def sum_(x: DD, axis=None, keepdims=False) -> DD:
    """Compensated reduction: pairwise over hi/lo with a final two_sum pass.

    Implemented as a sequential fold along `axis` is too slow; instead use
    the fact that partial sums of hi/lo in f32 then a compensation pass is
    accurate to ~n*eps32^2 for well-scaled data.  For solver-critical exact
    reductions prefer matmul-based accumulation (ops/ozaki.py).
    """
    hi = jnp.sum(x.hi, axis=axis, keepdims=keepdims)
    lo = jnp.sum(x.lo, axis=axis, keepdims=keepdims)
    return DD(*quick_two_sum(hi, lo))


def where(mask, x: DD, y: DD) -> DD:
    return DD(jnp.where(mask, x.hi, y.hi), jnp.where(mask, x.lo, y.lo))
