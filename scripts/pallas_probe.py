"""Probe what the installed Mosaic toolchain can compile on the real TPU.

Round-1 findings (jax 0.9.0): dynamic_slice, bool/f64 convert_element_type,
and optimization_barrier all fail to lower.  This probes the WORKAROUNDS:
  1. f32 Cholesky with one-hot-matmul column extraction (no dynamic_slice,
     no bool converts, no barriers);
  2. barrier-free two_sum/two_prod (Knuth/Dekker) — Mosaic is an MLIR
     pipeline that may not re-associate floats the way XLA's CPU loop
     emitter does, which would unlock compiled dd kernels without
     optimization_barrier;
  3. the existing tri_pair (dd) kernel with _ob monkeypatched to identity.

Run on the TPU box: python scripts/pallas_probe.py
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

print("backend:", jax.default_backend(), jax.devices())


def probe(name, fn):
    try:
        t0 = time.time()
        out = fn()
        out = jax.tree.map(lambda a: np.asarray(a), out)
        print(f"[OK]   {name}  ({time.time()-t0:.1f}s)")
        return out
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# ---------------------------------------------------------------- 1. f32 chol
def _chol_kernel(h_ref, l_ref):
    n = h_ref.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    def step(j, M):
        # Column extraction via masked VPU reduction, NOT an MXU dot: the
        # MXU would run the f32 "dot" in bf16 passes and truncate M's
        # entries (measured: 3e-3 recon error via jnp.dot).
        sel = jnp.where(iota.T == j, jnp.float32(1.0), jnp.float32(0.0))
        col = jnp.sum(M * sel, axis=1, keepdims=True)                 # (n,1)
        piv = jnp.sum(col * sel.T)                                    # scalar
        d = jnp.sqrt(piv)
        c = jnp.where(iota >= j, col / d, jnp.float32(0.0))           # (n,1)
        M = jnp.where((rows > j) & (cols > j), M - c * c.T, M)
        M = jnp.where(cols == j, c, M)
        return M

    # int32 loop bounds: under x64 the default i64 counter (and its i64
    # comparisons against the int32 iota) hit Mosaic's convert recursion
    M = lax.fori_loop(jnp.int32(0), jnp.int32(n), step, h_ref[...])
    l_ref[...] = jnp.where(rows >= cols, M, jnp.float32(0.0))


def run_chol(n=128):
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32)
    H = A @ A.T + n * np.eye(n, dtype=np.float32)
    L = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
    )(jnp.asarray(H))
    L = np.asarray(L)
    err = np.abs(L @ L.T - H).max() / np.abs(H).max()
    print("   chol recon rel err:", err)
    assert err < 1e-5, err
    return L


# ------------------------------------------------------- 2. barrier-free EFT
def _eft_kernel(a_ref, b_ref, s_ref, e_ref, p_ref, q_ref):
    a = a_ref[...]
    b = b_ref[...]
    # Knuth two_sum, NO optimization barrier
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    s_ref[...] = s
    e_ref[...] = err
    # Dekker two_prod, NO barrier
    SPLIT = jnp.float32(4097.0)
    p = a * b
    ta = SPLIT * a
    ua = ta - a
    ah = ta - ua
    al = a - ah
    tb = SPLIT * b
    ub = tb - b
    bh = tb - ub
    bl = b - bh
    perr = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    p_ref[...] = p
    q_ref[...] = perr


def run_eft():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 128)).astype(np.float32)
    b = (rng.normal(size=(8, 128)) * 1e-3).astype(np.float32)
    outs = pl.pallas_call(
        _eft_kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((8, 128), jnp.float32) for _ in range(4)
        ),
    )(jnp.asarray(a), jnp.asarray(b))
    s, e, p, q = (np.asarray(o) for o in outs)
    sum_exact = a.astype(np.float64) + b.astype(np.float64)
    prod_exact = a.astype(np.float64) * b.astype(np.float64)
    ok_sum = np.array_equal(s.astype(np.float64) + e.astype(np.float64), sum_exact)
    ok_prod = np.array_equal(p.astype(np.float64) + q.astype(np.float64), prod_exact)
    nonzero = (np.count_nonzero(e), np.count_nonzero(q))
    print("   two_sum exact:", ok_sum, " two_prod exact:", ok_prod,
          " nonzero err words:", nonzero)
    return ok_sum and ok_prod and all(z > 0 for z in nonzero)


# ---------------------------------------------- 3. dd tri solve, _ob = identity
def run_dd_trisolve(n=64):
    from socp_tpu.ops import dd as ddm
    from socp_tpu.ops import pallas_chol as pc

    orig = ddm._ob
    ddm._ob = lambda x: x   # Mosaic may not need the barrier
    try:
        rng = np.random.default_rng(2)
        A = rng.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)
        L64 = np.linalg.cholesky(H)
        L = ddm.from_f64(jnp.asarray(L64))
        b64 = rng.normal(size=(n, 1))
        b = ddm.from_f64(jnp.asarray(b64))
        # force compiled (not interpret) path
        pc._interpret.cache_clear()
        x = pc.tri_pair_solve(L, L.T, b)
        xh = np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)
        ref = np.linalg.solve(H, b64)
        rel = np.abs(xh - ref).max() / np.abs(ref).max()
        print("   dd trisolve rel err vs f64:", rel)
        return rel
    finally:
        ddm._ob = orig


if __name__ == "__main__":
    probe("f32 cholesky n=128 (one-hot extraction)", lambda: run_chol(128))
    probe("barrier-free EFT exactness", run_eft)
    probe("dd tri_pair_solve compiled (_ob=identity)", lambda: run_dd_trisolve(64))
