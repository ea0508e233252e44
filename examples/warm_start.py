"""Warm starting: re-solving a drifting problem from yesterday's optimum.

Typical production pattern (e.g. daily portfolio rebalancing): the problem
changes slightly each period, and the previous solution is an excellent
starting point.  `solve(prob, warm=(x, y, s, z))` skips the least-squares
initialization and recenters the start a little into the cone interior
(config.warm_push) — a warm point ON the boundary would destroy the NT
scaling.

  python examples/warm_start.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from socp_tpu import solve
from socp_tpu.models.portfolio import portfolio

prob, info = portfolio(0, n=120, k=12)
base = solve(prob)
print(f"day 0 (cold): {base.iterations} iterations, pcost {base.pcost:.6f}")

rng = np.random.default_rng(1)
total_cold = total_warm = 0
prev = base
for day in range(1, 6):
    # drift the expected returns a little
    prob.c = prob.c * (1.0 + 0.02 * rng.standard_normal(prob.c.shape))
    cold = solve(prob)
    warm = solve(prob, warm=(prev.x, prev.y, prev.s, prev.z))
    assert abs(warm.pcost - cold.pcost) <= 1e-7 * max(1.0, abs(cold.pcost))
    print(f"day {day}: cold {cold.iterations} iters, "
          f"warm {warm.iterations} iters (same optimum)")
    total_cold += cold.iterations
    total_warm += warm.iterations
    prev = warm

print(f"\ntotals over 5 re-solves: cold {total_cold}, warm {total_warm} "
      f"({100 * (1 - total_warm / total_cold):.0f}% fewer iterations)")
