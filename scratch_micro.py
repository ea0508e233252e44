import time, os
import numpy as np
import jax, jax.numpy as jnp
from socp_tpu.ops import dd as ddm
from socp_tpu.ops.ozaki import preslice, sliced_gram, sliced_matmul

rng = np.random.default_rng(0)
for (m, n) in [(130, 100), (520, 500)]:
    A = ddm.from_f32(jnp.asarray(rng.standard_normal((m, n)), jnp.float32))
    As = jax.jit(preslice)(A.T)
    f = jax.jit(lambda a: sliced_gram(preslice(a.T)))
    g = jax.jit(lambda s: sliced_gram(s))
    mv = jax.jit(lambda s, b: sliced_matmul(s, b))
    B = ddm.from_f32(jnp.asarray(rng.standard_normal((m, 3)), jnp.float32))
    for name, fn, arg in [("gram+preslice", f, A), ("gram(presliced)", g, As)]:
        r = fn(arg); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(5): r = fn(arg)
        jax.block_until_ready(r)
        print(f"m={m} n={n} {name:16s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")
    r = mv(As, B); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20): r = mv(As, B)
    jax.block_until_ready(r)
    print(f"m={m} n={n} {'matvec(q=3)':16s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms")
