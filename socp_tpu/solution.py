"""Solution / status types returned by the solver."""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np


class Status(enum.IntEnum):
    """Device-friendly int codes (match socp_tpu.utils.oracle)."""

    OPTIMAL = 0
    PRIMAL_INFEASIBLE = 1
    DUAL_INFEASIBLE = 2
    MAX_ITERATIONS = 3
    NUMERICAL_ERROR = 4
    RUNNING = -1  # internal: loop not finished


@dataclasses.dataclass
class Solution:
    """Solver result in the user's original (unpadded) cone order."""

    x: np.ndarray
    y: np.ndarray
    s: np.ndarray
    z: np.ndarray
    status: Status
    iterations: int
    pcost: float
    dcost: float
    gap: float
    relgap: float
    pres: float
    dres: float
    # True when the strict tolerances were NOT met but the restored best
    # iterate satisfies the relaxed (inaccurate) tolerances (ECOS-style).
    inaccurate: bool = False
    # Per-iteration table [pcost, dcost, gap, pres, dres, step], one row
    # per completed iteration (None unless SolverConfig.collect_history).
    history: Optional[np.ndarray] = None

    @property
    def optimal(self) -> bool:
        return self.status == Status.OPTIMAL

    @property
    def status_name(self) -> str:
        return self.status.name.lower()

    def __repr__(self):
        return (
            f"Solution(status={self.status_name}, iters={self.iterations}, "
            f"pcost={self.pcost:.6e}, gap={self.gap:.3e}, "
            f"pres={self.pres:.3e}, dres={self.dres:.3e})"
        )
