import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.pallas_chol import cholesky_dd_batched, tri_pair_solve_batched

rng = np.random.default_rng(0)
B, n, k = 8, 16, 2
M = rng.standard_normal((B, n, n)).astype(np.float32)
H = np.einsum('bij,bkj->bik', M, M) + 3*np.eye(n, dtype=np.float32)
Hdd = ddm.DD(jnp.asarray(H), jnp.zeros_like(jnp.asarray(H)))
try:
    L = jax.jit(lambda h: cholesky_dd_batched(h, tile=4))(Hdd)
    jax.block_until_ready(L.hi)
    print("chol_batched OK")
except Exception as e:
    print("chol_batched FAIL:", str(e)[:3000])
    L = None
if L is not None:
    b = ddm.DD(jnp.asarray(rng.standard_normal((B, n, k)).astype(np.float32)),
               jnp.zeros((B, n, k), jnp.float32))
    LT = ddm.DD(jnp.swapaxes(L.hi, 1, 2), jnp.swapaxes(L.lo, 1, 2))
    try:
        x = jax.jit(lambda l, lt, bb: tri_pair_solve_batched(l, lt, bb, tile=4))(L, LT, b)
        jax.block_until_ready(x.hi)
        print("tri_batched OK")
    except Exception as e:
        print("tri_batched FAIL:", str(e)[:3000])

# numeric check vs numpy
import numpy as _np
Lh = _np.asarray(L.hi, _np.float64) + _np.asarray(L.lo, _np.float64)
rec = _np.einsum('bij,bkj->bik', Lh, Lh)
print("chol max rel err:", _np.abs(rec - H).max() / _np.abs(H).max())
xh = _np.asarray(x.hi, _np.float64) + _np.asarray(x.lo, _np.float64)
bh = _np.asarray(b.hi, _np.float64)
res = _np.einsum('bij,bjk->bik', H, xh) - bh
print("solve max res:", _np.abs(res).max())
