import os
os.environ["JAX_PLATFORMS"] = "cpu"
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.dd import DD
from socp_tpu.ops.dd_linalg import dd_cholesky_blocked, dd_tri_inv, dd_chol_solve
from socp_tpu.ops.ozaki import preslice, sliced_matmul

rng = np.random.default_rng(0)

@jax.jit
def run(Hdd, bdd):
    L = dd_cholesky_blocked(Hdd)
    Linv = dd_tri_inv(L)
    x_sub = dd_chol_solve(L, bdd, LT=L.T)
    y = sliced_matmul(preslice(Linv), bdd)
    x_inv = sliced_matmul(preslice(Linv.T), y)
    return L, Linv, x_sub, x_inv

for n in [7, 32, 102, 130, 257]:
    t0 = time.time()
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    ev = np.logspace(0, -10, n)
    H = (Q * ev) @ Q.T
    Hdd = ddm.from_f64(jnp.asarray(H))
    b = rng.standard_normal((n, 1))
    bdd = ddm.from_f64(jnp.asarray(b))
    L, Linv, x_sub, x_inv = jax.block_until_ready(run(Hdd, bdd))
    P = np.asarray(L.hi, np.float64) + np.asarray(L.lo, np.float64)
    Pi = np.asarray(Linv.hi, np.float64) + np.asarray(Linv.lo, np.float64)
    err_ident = np.abs(P @ Pi - np.eye(n)).max()
    x_ref = np.linalg.solve(H, b)
    xs = np.asarray(x_sub.hi, np.float64) + np.asarray(x_sub.lo, np.float64)
    xi = np.asarray(x_inv.hi, np.float64) + np.asarray(x_inv.lo, np.float64)
    e_sub = np.abs(xs - x_ref).max() / np.abs(x_ref).max()
    e_inv = np.abs(xi - x_ref).max() / np.abs(x_ref).max()
    r_sub = np.abs(H @ xs - b).max()
    r_inv = np.abs(H @ xi - b).max()
    print(f"n={n:4d} ({time.time()-t0:5.1f}s) |L Linv - I|={err_ident:.2e}  fwd_err sub={e_sub:.2e} inv={e_inv:.2e}  resid sub={r_sub:.2e} inv={r_inv:.2e}", flush=True)
