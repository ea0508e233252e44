"""Two-stage stochastic portfolio via consensus ADMM over scenario shards
(BASELINE config 5), cross-checked against the extensive form.

Run:  python examples/admm_stochastic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from socp_tpu import solve
from socp_tpu.models.stochastic import extensive_form, scenario_portfolio
from socp_tpu.parallel.admm import admm_consensus

S = 32
c, G, h, dims, A, b, info = scenario_portfolio(0, n=12, n_scenarios=S)
res = admm_consensus(c, G, h, dims, info["n"], A=A, b=b, rho=1.0,
                     outer_iters=100, tol=1e-6, verbose=True)
print(f"\nADMM: {res.outer_iterations} outer iters, "
      f"objective {res.objective:.6f}")

ext = solve(extensive_form(c, G, h, dims, A, b, info))
print(f"extensive form: {ext.status.name}, objective {ext.pcost:.6f}")
