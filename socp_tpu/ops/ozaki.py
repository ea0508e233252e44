"""Ozaki-scheme matrix multiply: f64-grade GEMM on the bf16 MXU.

The TPU has no fast f64 matmul, but dd32 (double-word f32) GEMMs cannot be
built from plain f32 matmuls either — the MXU rounds every accumulation
step, so the error-free transformations that work elementwise do not apply
inside a dot product.  The Ozaki splitting sidesteps this with EXACT
integer-like arithmetic on the fast matrix unit:

  1. scale each column of A (row of B) by a power of two so |a| <= 1;
  2. peel T=7 slices of 7 mantissa bits each: a = sum_t S_t 2^(-6-7t),
     with S_t integer-valued in [-65, 65];
  3. slice products are EXACT in bf16 (|S_t. S_u| <= 2^13 < 2^8 mantissa...
     each product is an integer < 2^13, exactly representable), and the MXU
     accumulates them in f32, exactly while partial sums stay < 2^24 —
     guaranteed for contraction lengths m <= 2^24 / 2^13 / slack; we require
     m <= 2048 per call and chunk above;
  4. per-diagonal (t+u = k) sums combine exactly in f32; the 7 diagonal
     results merge into a dd32 value with the power-of-two scales restored
     (exact scaling).

Pairs with t+u >= 7 are dropped: their magnitude is < 2^-49 relative to the
column scales, matching dd32's own precision.  28 bf16 MXU passes total —
measured orders of magnitude faster than XLA's emulated f64 GEMM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD

N_SLICES = 7
_W = 7                      # bits per slice
MAX_CONTRACT = 2048         # per-chunk exact-accumulation bound


@functools.cache
def _slice_dtype():
    """bf16 slices ride the fastest MXU path on TPU; the XLA CPU backend has
    no bf16 dot, so use f32 there (equally exact: slice products are small
    integers)."""
    import jax as _jax

    return jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32


def _pow2_colscale(x: DD, axis: int) -> jax.Array:
    """Power-of-two scale s with |x|/s <= 1 along `axis` (f32, exact).

    NB: jnp.exp2 lowers to libm exp on some backends and is NOT exact at
    integer arguments (observed: exp2(15) = 32767.984 on XLA CPU), which
    silently breaks the exact-scaling premise — use ldexp instead.
    """
    mag = jnp.max(jnp.abs(x.hi), axis=axis, keepdims=True)
    mag = jnp.maximum(mag, jnp.float32(2.0 ** -100))
    e = jnp.ceil(jnp.log2(mag)).astype(jnp.int32)
    return jnp.ldexp(jnp.ones_like(mag, jnp.float32), e)


def _slices(x: DD, scale: jax.Array) -> jax.Array:
    """Peel N_SLICES 7-bit slices from x/scale.  Returns bf16 (T, *x.shape);
    slice t carries the value S_t * 2^(-6-7t) * scale.

    Two-stage peel: the hi word's 24-bit mantissa fits entirely in the
    first four 7-bit slices, so those peel with PURE f32 subtractions
    (r - q is exact: q is r rounded to a coarser aligned grid, so the
    difference is r's own low-order bits — <= 24 of them).  The lo word
    then merges via one two_sum and feeds the last three slices the same
    way.  Replaces seven full dd subtractions (~12 ops each) with six
    3-op f32 peels + one two_sum — the peel is the memory/op-bound part
    of the Ozaki scheme (accuracy unchanged: residual error ~2^-65 of the
    scale enters only the final slice)."""
    inv = 1.0 / scale                      # power of two: exact
    out = []
    r = x.hi * inv                         # exact scaling
    for t in range(4):
        sc = jnp.float32(2.0 ** (6 + _W * t))
        q = jnp.round(r * sc) / sc         # integer/2^(6+7t): exact in f32
        out.append((q * sc).astype(_slice_dtype()))  # integer <= ~65: exact
        r = r - q                          # exact (aligned leading bits)
    s, e = ddm.two_sum(r, x.lo * inv)      # bring in the lo word exactly
    for t in range(4, N_SLICES - 1):
        sc = jnp.float32(2.0 ** (6 + _W * t))
        q = jnp.round(s * sc) / sc
        out.append((q * sc).astype(_slice_dtype()))
        s = s - q                          # exact
    sc = jnp.float32(2.0 ** (6 + _W * (N_SLICES - 1)))
    q = jnp.round((s + e) * sc) / sc       # e re-enters below 2^-48*scale
    out.append((q * sc).astype(_slice_dtype()))
    return jnp.stack(out)


from typing import NamedTuple


class SlicedMat(NamedTuple):
    """A pre-sliced dd matrix: reuse across many multiplies (constant
    problem data G/A/P are sliced ONCE per solve; only the skinny variable
    operand is sliced per matvec)."""

    S: jax.Array       # (T, p, m) slice integers (bf16 on TPU, f32 on CPU)
    scale: jax.Array   # (p, 1) power-of-two row scales


def preslice(a: DD) -> SlicedMat:
    """Slice a (p, m) dd matrix along its rows (contraction over axis 1)."""
    sa = _pow2_colscale(a, axis=1)
    return SlicedMat(S=_slices(a, sa), scale=sa)


def dd_matmul(a: DD, b: DD) -> DD:
    """C = a @ b for dd32 matrices a (p, m), b (m, q) -> dd32 (p, q).

    Contractions longer than MAX_CONTRACT are chunked inside sliced_matmul
    (exact per-chunk accumulation, dd-summed across chunks).  Accuracy
    ~2^-48 relative to the row/column scales.
    """
    m2 = b.hi.shape[0]
    assert a.hi.shape[1] == m2
    return sliced_matmul(preslice(a), b)


# Largest exact f32 accumulation: slice products are integers <= 65^2, and
# partial sums stay exactly representable while count * 65^2 < 2^24.
_MAX_EXACT_TERMS = (1 << 24) // (65 * 65)  # 3971



def _combine_diagonals(m: int, pair_dot) -> DD:
    """Combine all slice-pair products sum_{t+u<=6} 2^(-12-7(t+u)) P(t,u).

    Pair results are integer-valued and < m*65^2 each, so up to
    g = _MAX_EXACT_TERMS // m of them sum EXACTLY in plain f32 — those adds
    fuse into the dot epilogues, with two_sum compensation only between
    groups (needed only for contractions m > _MAX_EXACT_TERMS / 7).
    No operand stacking or concatenation: each of the 28 dots reads its
    slice views in place, which is what keeps this memory-bound step at
    one pass over the slice arrays.
    """
    g = max(1, _MAX_EXACT_TERMS // max(m, 1))
    acc = None
    for k in range(N_SLICES):
        dk_hi = None
        dk_lo = None
        for t0 in range(0, k + 1, g):
            part = None
            for t in range(t0, min(t0 + g, k + 1)):
                d = pair_dot(t, k - t)
                part = d if part is None else part + d     # exact in f32
            if dk_hi is None:
                dk_hi, dk_lo = part, jnp.zeros_like(part)
            else:
                dk_hi, e2 = ddm.two_sum(dk_hi, part)
                dk_lo = dk_lo + e2
        dk = DD(*ddm.quick_two_sum(dk_hi, dk_lo))
        term = ddm.mul_f32(dk, jnp.float32(2.0 ** (-12 - _W * k)))
        acc = term if acc is None else ddm.add(acc, term)
    return acc


def _chunked_diagonals(m: int, pair_dot_chunk) -> DD:
    """_combine_diagonals over a contraction of length m, split into
    MAX_CONTRACT chunks so each chunk's f32 accumulation stays exact;
    chunk results are dd-summed.  `pair_dot_chunk(t, u, s, e)` returns the
    (t, u) slice-pair dot restricted to contraction rows [s, e)."""
    if m <= MAX_CONTRACT:
        return _combine_diagonals(m, lambda t, u: pair_dot_chunk(t, u, 0, m))
    out = None
    for s in range(0, m, MAX_CONTRACT):
        e = min(s + MAX_CONTRACT, m)
        piece = _combine_diagonals(
            e - s, lambda t, u, s=s, e=e: pair_dot_chunk(t, u, s, e)
        )
        out = piece if out is None else ddm.add(out, piece)
    return out


def sliced_matmul(A: SlicedMat, b: DD) -> DD:
    """C = A @ b with A pre-sliced (T, p, m) and b dd (m, q).

    Only b is sliced here (one peel pass); the 28 slice-pair dots read
    their operands as in-place views of the slice arrays and combine per
    correction diagonal via _combine_diagonals (exact f32 epilogue adds).
    Contractions beyond MAX_CONTRACT are chunked (per-chunk exact
    accumulation, dd adds across chunks) — chunking presliced arrays is
    valid because peeling is elementwise and the row scales cover the
    whole row.
    """
    m = b.hi.shape[0]
    assert m == A.S.shape[2]
    sa = A.scale
    sb = _pow2_colscale(b, axis=0)         # (1, q) col scales of b
    B = _slices(b, sb)                     # (T, m, q)

    acc = _chunked_diagonals(
        m, lambda t, u, s, e: jax.lax.dot_general(
            jax.lax.slice_in_dim(A.S[t], s, e, axis=1),
            jax.lax.slice_in_dim(B[u], s, e, axis=0),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    # restore scales (powers of two: exact on both words)
    s = sa * sb                             # (p, q) via broadcasting
    return DD(acc.hi * s, acc.lo * s)


def sliced_gram(A: SlicedMat, row_scale: jax.Array | None = None) -> DD:
    """C = M @ M.T for a presliced M (p, m) — both operand sides reuse M's
    slices (the b-side slices are just their transposes, with the same
    power-of-two scales), so the Gram costs ZERO extra slicing passes.
    Slicing is the memory-bound part of the Ozaki scheme (7 peeled passes
    over the full matrix); the KKT factor already preslices W^-1 G for the
    back-solves, making its Gram slicing entirely free.  Contractions
    beyond MAX_CONTRACT are chunked like sliced_matmul.

    `row_scale` (p,): optional POWER-OF-TWO per-row factors folded into the
    scale restore, returning diag(r) C diag(r) for free — the Jacobi
    equilibration of the KKT factor rides the multiply that was already
    there (must be powers of two so both dd words scale exactly).
    """
    m = A.S.shape[2]
    acc = _chunked_diagonals(
        m, lambda t, u, s, e: jax.lax.dot_general(
            jax.lax.slice_in_dim(A.S[t], s, e, axis=1),
            jax.lax.slice_in_dim(A.S[u], s, e, axis=1),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    )
    sc = A.scale
    if row_scale is not None:
        sc = sc * row_scale.reshape(-1, 1)
    s = sc * sc.reshape(1, -1)               # (p, p)
    return DD(acc.hi * s, acc.lo * s)


def dd_matvec(a: DD, x: DD) -> DD:
    """y = a @ x for a (p, m) dd, x (m,) dd."""
    y = dd_matmul(a, DD(x.hi[:, None], x.lo[:, None]))
    return DD(y.hi[:, 0], y.lo[:, 0])
