import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.pallas_chol import cholesky_dd, tri_pair_solve

rng = np.random.default_rng(0)
n, k = 16, 2
M = rng.standard_normal((n, n)).astype(np.float32)
H = M @ M.T + 3*np.eye(n, dtype=np.float32)
Hdd = ddm.DD(jnp.asarray(H), jnp.zeros_like(jnp.asarray(H)))
L = jax.jit(cholesky_dd)(Hdd)
jax.block_until_ready(L.hi)
print("chol single OK")
b = ddm.DD(jnp.asarray(rng.standard_normal((n, k)).astype(np.float32)),
           jnp.zeros((n, k), jnp.float32))
LT = ddm.DD(L.hi.T, L.lo.T)
x = jax.jit(tri_pair_solve)(L, LT, b)
jax.block_until_ready(x.hi)
print("tri single OK")
