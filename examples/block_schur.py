"""Block-structured SOCP with mesh-distributed Schur KKT (BASELINE config 4).

Run on a fake 8-device mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/block_schur.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from socp_tpu import SolverConfig
from socp_tpu.parallel.mesh import block_mesh
from socp_tpu.parallel.schur import random_block_problem, solve_block

ndev = len(jax.devices())
K = 8 * ndev
prob, pstar = random_block_problem(0, K=K, nb=8, p=4)
print(f"{K} blocks over {ndev} device(s); known optimum {pstar:.6f}")
x, y, s, z, status, iters, stats = solve_block(
    prob, mesh=block_mesh(), config=SolverConfig(verbose=True)
)
print(f"\nstatus={status.name} iters={iters} pcost={stats[0]:.6f} "
      f"gap={stats[2]:.2e}")
