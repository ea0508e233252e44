import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
from socp_tpu import api
from socp_tpu.config import SolverConfig
from socp_tpu.models.robust_ls import robust_ls

prob, info = robust_ls(0, n=12)
cfg = SolverConfig(native_dd=True, verbose=False)
t0 = time.perf_counter()
sol = api.solve(prob, cfg)
t1 = time.perf_counter()
print(f"dd n=12 x64 first: {t1-t0:.1f}s status={sol.status} gap={sol.gap:.2e}")
