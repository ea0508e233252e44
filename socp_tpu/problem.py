"""Problem definition types shared by the oracle, the JAX solver, and models.

Standard conic form (SURVEY.md section 2.1 capability contract):

    minimize    (1/2) x'Px + c'x
    subject to  Ax = b
                Gx + s = h,  s in K = R+^l x Q^{q_1} x ... x Q^{q_N}

`ConeDims` is a static, hashable descriptor (safe to close over under jit);
`SocpProblem` is a host-side container of plain NumPy arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class ConeDims:
    """K = R+^l x Q^{qs[0]} x ... x Q^{qs[-1]}.

    `l` is the nonnegative-orthant length; `qs` are the second-order cone
    dimensions (each >= 1; a dim-1 SOC is just another orthant coordinate).
    """

    l: int
    qs: tuple[int, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "l", int(self.l))
        object.__setattr__(self, "qs", tuple(int(q) for q in self.qs))
        if self.l < 0:
            raise ValueError(f"orthant length must be >= 0, got {self.l}")
        if any(q < 1 for q in self.qs):
            raise ValueError(f"SOC dims must be >= 1, got {self.qs}")

    @property
    def dim(self) -> int:
        """Total length of the flat cone vector (rows of G)."""
        return self.l + sum(self.qs)

    @property
    def degree(self) -> int:
        """Barrier degree nu = l + #SOCs; mu = s'z / nu on the central path."""
        return self.l + len(self.qs)

    def soc_slices(self):
        off = self.l
        for q in self.qs:
            yield slice(off, off + q)
            off += q


@dataclasses.dataclass
class SocpProblem:
    """Host-side SOCP data (NumPy).  A/b/P are optional (empty / zero)."""

    c: np.ndarray
    G: np.ndarray
    h: np.ndarray
    dims: ConeDims
    A: Optional[np.ndarray] = None
    b: Optional[np.ndarray] = None
    P: Optional[np.ndarray] = None

    def __post_init__(self):
        # Accept scipy.sparse matrices for G/A/P (the norm in the Julia
        # reference's ecosystem) by densifying: TPU KKT pipelines are dense
        # (MXU) / block-dense (parallel.schur), so sparsity is exploited
        # structurally (blocks, cones), not via scalar sparse storage.
        def _dense(a):
            return a.toarray() if hasattr(a, "toarray") else a

        self.c = np.asarray(self.c, dtype=np.float64)
        self.G = np.asarray(_dense(self.G), dtype=np.float64)
        self.h = np.asarray(self.h, dtype=np.float64)
        if self.A is not None:
            self.A = _dense(self.A)
        if self.P is not None:
            self.P = _dense(self.P)
        n = self.c.shape[0]
        if self.G.shape != (self.dims.dim, n):
            raise ValueError(
                f"G shape {self.G.shape} != (cone dim {self.dims.dim}, n {n})"
            )
        if self.h.shape != (self.dims.dim,):
            raise ValueError(f"h shape {self.h.shape} != ({self.dims.dim},)")
        if self.A is None:
            self.A = np.zeros((0, n))
            self.b = np.zeros((0,))
        self.A = np.asarray(self.A, dtype=np.float64)
        self.b = np.asarray(self.b, dtype=np.float64)
        if self.A.shape[1] != n or self.b.shape != (self.A.shape[0],):
            raise ValueError(f"A/b shapes {self.A.shape}/{self.b.shape} invalid")
        if self.P is not None:
            self.P = np.asarray(self.P, dtype=np.float64)
            if self.P.shape != (n, n):
                raise ValueError(f"P shape {self.P.shape} != ({n}, {n})")

    @property
    def n(self) -> int:
        return self.c.shape[0]

    @property
    def p(self) -> int:
        return self.A.shape[0]

    @property
    def m(self) -> int:
        return self.G.shape[0]
