"""socp_tpu: a TPU-native second-order cone programming framework.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
BenChung/Socp.jl (primal-dual interior-point SOCP solver with Nesterov-Todd
scalings and Mehrotra predictor-corrector steps — see SURVEY.md), designed
TPU-first: padded/bucketed cone layouts, condensed MXU-friendly KKT solves,
lockstep vmap batching, mesh-sharded block-Schur KKT, and Pallas kernels on
the hot paths.
"""

from socp_tpu.api import (prepare_batch, solve, solve_batch,
                          solve_batch_raw)
from socp_tpu.config import DEFAULT_CONFIG, KKTStrategy, SolverConfig
from socp_tpu.problem import ConeDims, SocpProblem
from socp_tpu.solution import Solution, Status

__version__ = "0.1.0"

__all__ = [
    "solve",
    "solve_batch",
    "solve_batch_raw",
    "prepare_batch",
    "SolverConfig",
    "DEFAULT_CONFIG",
    "KKTStrategy",
    "ConeDims",
    "SocpProblem",
    "Solution",
    "Status",
]
