"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; compiled on real TPU — SURVEY.md 4.2 kernel-test row)."""

import numpy as np
import jax
import jax.numpy as jnp

from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd_linalg import dd_cholesky
from socp_tpu.ops.pallas_chol import cholesky_dd, cholesky_f32


def _spd(rng, n, kappa=1e4):
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    ev = np.logspace(-np.log10(kappa), 0, n)
    H = (Q * ev) @ Q.T
    return (H + H.T) / 2


def test_pallas_chol_f32():
    rng = np.random.default_rng(0)
    H = _spd(rng, 32).astype(np.float32)
    L = jax.jit(cholesky_f32)(jnp.asarray(H))
    ref = jnp.linalg.cholesky(jnp.asarray(H))
    np.testing.assert_allclose(np.asarray(L), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_pallas_chol_f32_batched():
    rng = np.random.default_rng(1)
    Hs = np.stack([_spd(rng, 16) for _ in range(4)]).astype(np.float32)
    L = jax.jit(jax.vmap(cholesky_f32))(jnp.asarray(Hs))
    ref = jnp.linalg.cholesky(jnp.asarray(Hs))
    np.testing.assert_allclose(np.asarray(L), np.asarray(ref), rtol=2e-5,
                               atol=2e-6)


def test_pallas_chol_dd():
    rng = np.random.default_rng(2)
    H64 = _spd(rng, 24, kappa=1e8)
    Hdd = ddm.from_f64(jnp.asarray(H64))
    L = jax.jit(cholesky_dd)(Hdd)
    ref = dd_cholesky(Hdd)
    # the kernel reads trailing columns as rows (symmetric block) — a
    # different-but-equally-accurate rounding path than the XLA column
    # extraction, so agreement is kappa-amplified-dd grade, not bitwise
    np.testing.assert_allclose(
        np.asarray(L.astype_f64()), np.asarray(ref.astype_f64()),
        rtol=1e-9, atol=1e-11,
    )
    L64 = np.linalg.cholesky(H64)
    err = np.max(np.abs(np.asarray(L.astype_f64()) - L64)) / np.abs(L64).max()
    assert err < 1e-9


def test_pallas_integrated_dd_solve():
    """End-to-end: the dd driver with use_pallas=True (VMEM-resident KKT
    back-solves) must agree with the XLA-substitution path.  Interpret mode
    on CPU; the same dispatch compiles on TPU (scripts/pallas_bench.py)."""
    from socp_tpu import SolverConfig, solve
    from socp_tpu.models.robust_ls import robust_ls

    prob, _ = robust_ls(0, n=10)
    ref = solve(prob, config=SolverConfig(native_dd=True, use_pallas=False))
    rp = solve(prob, config=SolverConfig(native_dd=True, use_pallas=True))
    assert rp.status.name == "OPTIMAL"
    assert abs(rp.pcost - ref.pcost) <= 1e-8 * max(1.0, abs(ref.pcost))
    np.testing.assert_allclose(rp.x, ref.x, atol=1e-7)


def test_pallas_tri_pair_solve():
    rng = np.random.default_rng(3)
    n = 24
    H = _spd(rng, n, kappa=1e8)
    Hdd = ddm.from_f64(jnp.asarray(H))
    from socp_tpu.ops.dd_linalg import dd_cholesky_blocked, dd_chol_solve
    from socp_tpu.ops.pallas_chol import tri_pair_solve

    L = dd_cholesky_blocked(Hdd)
    LT = ddm.DD(L.hi.T, L.lo.T)
    b = ddm.from_f64(jnp.asarray(rng.standard_normal((n, 1))))
    x = jax.jit(tri_pair_solve)(L, LT, b)
    ref = dd_chol_solve(L, b)
    np.testing.assert_allclose(
        np.asarray(x.astype_f64()), np.asarray(ref.astype_f64()),
        rtol=1e-10, atol=1e-12,
    )


def test_pallas_instance_tiled_chol_batched():
    """The instance-tiled batched kernel == per-instance XLA dd Cholesky,
    including under vmap via the custom_vmap entry point (the lockstep
    driver's route onto the tiled grid)."""
    from socp_tpu.ops.pallas_chol import cholesky_dd_batched, cholesky_dd_v

    rng = np.random.default_rng(4)
    B, n = 8, 24
    Hs = np.stack([_spd(rng, n, kappa=1e8) for _ in range(B)])
    Hdd = ddm.from_f64(jnp.asarray(Hs))
    L_tiled = jax.jit(lambda H: cholesky_dd_batched(H, tile=4))(Hdd)
    L_vmap = jax.jit(jax.vmap(cholesky_dd_v))(Hdd)
    ref = jax.vmap(dd_cholesky)(Hdd)
    for L in (L_tiled, L_vmap):
        np.testing.assert_allclose(
            np.asarray(L.astype_f64()), np.asarray(ref.astype_f64()),
            rtol=1e-9, atol=1e-11,
        )


def test_pallas_instance_tiled_tri_batched():
    from socp_tpu.ops.dd_linalg import dd_chol_solve, dd_cholesky_blocked
    from socp_tpu.ops.pallas_chol import (tri_pair_solve_batched,
                                          tri_pair_solve_v)

    rng = np.random.default_rng(5)
    B, n = 8, 24
    Hs = np.stack([_spd(rng, n, kappa=1e8) for _ in range(B)])
    Hdd = ddm.from_f64(jnp.asarray(Hs))
    L = jax.vmap(dd_cholesky_blocked)(Hdd)
    LT = ddm.DD(jnp.swapaxes(L.hi, 1, 2), jnp.swapaxes(L.lo, 1, 2))
    b = ddm.from_f64(jnp.asarray(rng.standard_normal((B, n, 1))))
    x_tiled = jax.jit(lambda *a: tri_pair_solve_batched(*a, tile=4))(L, LT, b)
    x_vmap = jax.jit(jax.vmap(tri_pair_solve_v))(L, LT, b)
    ref = jax.vmap(dd_chol_solve)(L, b)
    for x in (x_tiled, x_vmap):
        np.testing.assert_allclose(
            np.asarray(x.astype_f64()), np.asarray(ref.astype_f64()),
            rtol=1e-10, atol=1e-12,
        )
