"""Solver-state snapshot / resume (SURVEY.md section 5 checkpoint row).

The solver state is a plain pytree (x, y, s, z, iteration counter), so
checkpointing is a small npz file — enough to resume long multi-host ADMM
or scenario runs without re-solving.  Kept deliberately minimal per the
survey ("trivially serializable ... keep minimal"); orbax interop is a
one-liner on top of `to_pytree`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class SolverCheckpoint:
    """A resumable snapshot of an (interrupted) solve or ADMM outer loop."""

    x: np.ndarray
    y: np.ndarray
    s: np.ndarray
    z: np.ndarray
    iteration: int
    meta: dict = dataclasses.field(default_factory=dict)

    def save(self, path: str) -> None:
        np.savez(
            path,
            x=self.x, y=self.y, s=self.s, z=self.z,
            iteration=np.asarray(self.iteration),
            **{f"meta_{k}": np.asarray(v) for k, v in self.meta.items()},
        )

    @classmethod
    def load(cls, path: str) -> "SolverCheckpoint":
        with np.load(path) as f:
            meta = {
                k[len("meta_"):]: f[k] for k in f.files if k.startswith("meta_")
            }
            return cls(
                x=f["x"], y=f["y"], s=f["s"], z=f["z"],
                iteration=int(f["iteration"]), meta=meta,
            )

    def to_pytree(self) -> dict:
        return {"x": self.x, "y": self.y, "s": self.s, "z": self.z,
                "iteration": self.iteration}
