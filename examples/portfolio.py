"""Markowitz portfolio with a factor risk model (BASELINE config 2).

Run:  python examples/portfolio.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

from socp_tpu import solve
from socp_tpu.models.portfolio import portfolio, portfolio_risk

prob, info = portfolio(seed=7, n=200, k=16, sigma_max=0.15)
# verbose uses jax.debug.print (host callback) — unsupported on the
# tunneled dev-TPU platform (which still reports backend "tpu")
verbose = jax.default_backend() == "cpu"
sol = solve(prob, verbose=verbose)
w = sol.x[: info["mu"].shape[0]]
print(f"\nstatus={sol.status.name} iters={sol.iterations} gap={sol.gap:.2e}")
print(f"expected return: {info['mu'] @ w:.4f}")
print(f"risk: {portfolio_risk(info, w):.4f} (limit {info['sigma_max']})")
