"""Batched robust least-squares: B independent SOCPs in lockstep
(BASELINE config 3).

Run:  python examples/batched_robust_ls.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)

import socp_tpu
from socp_tpu import SolverConfig
from socp_tpu.models.robust_ls import robust_ls_batch

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
c, G, h, dims = robust_ls_batch(0, batch=B, n=50)

on_tpu = jax.default_backend() not in ("cpu",)
cfg = SolverConfig(factor_dtype="dd32", native_dd=on_tpu)

t0 = time.time()
x, y, s, z, status, iters, stats, _ = socp_tpu.solve_batch_raw(
    c, G, h, dims, config=cfg
)
print(f"first call (incl. compile): {time.time() - t0:.1f}s")
t0 = time.time()
out = socp_tpu.solve_batch_raw(c, G, h, dims, config=cfg)
dt = time.time() - t0
ok = int((status == 0).sum())
print(f"steady: {dt:.2f}s -> {B/dt:.1f} solves/s | optimal {ok}/{B} "
      f"| max gap {stats[:, 2].max():.2e}")
