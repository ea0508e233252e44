import time, sys
import numpy as np
import jax
from socp_tpu import api
from socp_tpu.config import SolverConfig
from socp_tpu.models.random_socp import random_socp

prob, known = random_socp(seed=0)
cfg = SolverConfig(native_dd=True, verbose=False)
t0 = time.perf_counter()
sol = api.solve(prob, cfg)
t1 = time.perf_counter()
sol2 = api.solve(prob, cfg)
t2 = time.perf_counter()
print(f"first(compile+run): {t1-t0:.1f}s  warm: {t2-t1:.3f}s  status={sol.status} gap={sol.gap:.2e}")
