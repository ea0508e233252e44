"""Probe 2: dynamic REF indexing (pl.ds) inside Mosaic kernels.

Round 1 established that lax.dynamic_slice on VALUES fails to lower; this
probes pl.ds on REFS (memory indexing), which lowers to address arithmetic
instead of vector ops.  If it works, triangular substitutions can read one
row per step (O(n) traffic) instead of masked-extracting from the full
matrix (O(n^2) per step) — the current tri_pair kernel's cost driver.

Run: python scripts/pallas_probe2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_socp")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

print("backend:", jax.default_backend())


def probe(name, fn):
    try:
        t0 = time.time()
        out = fn()
        print(f"[OK]   {name}  ({time.time()-t0:.1f}s)")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:220]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# ---- 1. dynamic ref READ: sum of rows selected by loop index
def _read_kernel(m_ref, o_ref):
    n = m_ref.shape[0]

    def step(j, acc):
        row = m_ref[pl.ds(j, 1), :]          # (1, n) dynamic ref read
        return acc + row

    o_ref[...] = lax.fori_loop(jnp.int32(0), jnp.int32(n), step,
                               jnp.zeros((1, m_ref.shape[1]), jnp.float32))


def run_read(n=64):
    M = np.arange(n * n, dtype=np.float32).reshape(n, n)
    out = pl.pallas_call(
        _read_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(out), M.sum(0, keepdims=True))
    return True


# ---- 2. dynamic ref WRITE: reverse rows via loop
def _write_kernel(m_ref, o_ref):
    n = m_ref.shape[0]

    def step(j, _):
        o_ref[pl.ds(jnp.int32(n - 1) - j, 1), :] = m_ref[pl.ds(j, 1), :]
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n), step, 0)


def run_write(n=64):
    M = np.arange(n * n, dtype=np.float32).reshape(n, n)
    out = pl.pallas_call(
        _write_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )(jnp.asarray(M))
    np.testing.assert_allclose(np.asarray(out), M[::-1])
    return True


# ---- 3. f32 forward substitution via pl.ds row reads + incremental update
def _fwd_kernel(lt_ref, b_ref, x_ref):
    """Solve L x = b using rows of LT (column j of L).  x_ref doubles as
    the running residual vector."""
    n = lt_ref.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x_ref[...] = b_ref[...]

    def step(j, _):
        Lcol = lt_ref[pl.ds(j, 1), :].T          # (n, 1): column j of L
        piv = jnp.sum(Lcol * jnp.where(iota == j, 1.0, 0.0))
        bj = x_ref[pl.ds(j, 1), :]               # (1, k)
        xj = bj / piv
        x_ref[pl.ds(j, 1), :] = xj
        coef = jnp.where(iota > j, Lcol, 0.0)    # (n, 1)
        x_ref[...] = x_ref[...] - coef * xj
        return 0

    lax.fori_loop(jnp.int32(0), jnp.int32(n), step, 0)


def run_fwd(n=128, k=1):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n))
    L = np.linalg.cholesky(A @ A.T + n * np.eye(n)).astype(np.float32)
    b = rng.normal(size=(n, k)).astype(np.float32)
    x = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, k), jnp.float32),
    )(jnp.asarray(L.T.copy()), jnp.asarray(b))
    ref = np.linalg.solve(L, b)
    rel = np.abs(np.asarray(x) - ref).max() / np.abs(ref).max()
    print("   fwd substitution rel err:", rel)
    assert rel < 1e-4, rel
    return True


if __name__ == "__main__":
    probe("pl.ds dynamic ref READ", run_read)
    probe("pl.ds dynamic ref WRITE", run_write)
    probe("f32 fwd substitution via pl.ds", run_fwd)
