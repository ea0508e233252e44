"""Static cone layout: structure-of-arrays with padding (SURVEY.md 7.1).

TPUs want dense, statically-shaped, batched operands.  A product cone
R+^l x Q^{q_1} x ... x Q^{q_N} with heterogeneous q_i is therefore laid out
as:

  [ orthant (l) | bucket_0: (nb_0 blocks x qp_0) | bucket_1: ... ]

where SOC blocks are grouped into *buckets* of equal padded dimension qp
(q rounded up to a multiple of `bucket_multiple`, min 2), reordered so each
bucket occupies one contiguous range of the padded flat vector.  Every cone
kernel then views a bucket as a free `(nb, qp)` reshape — no gathers, no
ragged ops, pure batched VPU/MXU work.

Zero-padding a SOC block's tail coordinates is *exact*: all Jordan ops
(arrow product, det, inverse, sqrt, NT scaling, max-step quadratic) restrict
to the original block when tail coordinates are zero, and every operation in
the solver preserves zero tails (G's padded rows are zero, W is
diag + rank-1 with zero-tail generators).  No masks are needed on the hot
path.

The layout (a frozen, hashable descriptor) also carries the permutation
between the user's flat cone order and the padded order, applied once on
the host at problem setup.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from socp_tpu.problem import ConeDims


@dataclasses.dataclass(frozen=True)
class Bucket:
    """One padded size class of SOC blocks."""

    q_pad: int          # padded block dimension
    n_blocks: int       # number of real blocks in this bucket
    offset: int         # start position in the padded flat vector

    @property
    def size(self) -> int:
        return self.q_pad * self.n_blocks


@dataclasses.dataclass(frozen=True, eq=True)
class ConeLayout:
    """Static, hashable: safe to close over / pass as a jit static arg."""

    l: int
    buckets: tuple[Bucket, ...]
    degree: int          # nu = l + #SOC blocks (padding does not change it)
    m_orig: int          # original flat dimension l + sum(qs)
    m_pad: int           # padded flat dimension
    # map: original flat index -> padded flat index (tuple: hashable/static)
    perm: tuple[int, ...] = dataclasses.field(repr=False)

    @functools.cached_property
    def perm_np(self) -> np.ndarray:
        return np.asarray(self.perm, dtype=np.int64)

    # ---- host-side conversions (NumPy) ------------------------------------

    def pad_vec(self, v: np.ndarray) -> np.ndarray:
        """Original flat (m_orig,) -> padded flat (m_pad,), zeros elsewhere."""
        out = np.zeros(v.shape[:-1] + (self.m_pad,), dtype=v.dtype)
        out[..., self.perm_np] = v
        return out

    def unpad_vec(self, v: np.ndarray) -> np.ndarray:
        return np.asarray(v)[..., self.perm_np]

    def pad_rows(self, M: np.ndarray) -> np.ndarray:
        """(m_orig, n) -> (m_pad, n) with zero rows in padding positions."""
        out = np.zeros(M.shape[:-2] + (self.m_pad,) + M.shape[-1:], dtype=M.dtype)
        out[..., self.perm_np, :] = M
        return out


def make_layout(dims: ConeDims, bucket_multiple: int = 8) -> ConeLayout:
    """Build the padded layout for a product cone."""
    qs = dims.qs
    # padded dim per block: >= 2 (a dim-1 "SOC" still has a u0/u1 split),
    # rounded up to the bucket granularity
    def padq(q: int) -> int:
        q = max(q, 2)
        r = bucket_multiple
        return ((q + r - 1) // r) * r if r > 1 else q

    by_pad: dict[int, list[int]] = {}
    for i, q in enumerate(qs):
        by_pad.setdefault(padq(q), []).append(i)

    buckets: list[Bucket] = []
    # original flat index -> padded flat index
    perm = np.empty(dims.dim, dtype=np.int64)
    perm[: dims.l] = np.arange(dims.l)
    soc_starts = np.empty(len(qs), dtype=np.int64)
    off = dims.l
    for i, q in enumerate(qs):
        soc_starts[i] = dims.l + int(np.sum([qs[j] for j in range(i)]))
    offsets = np.cumsum([0] + list(qs[:-1])) + dims.l  # original block starts
    pos = dims.l
    for q_pad in sorted(by_pad):
        idxs = by_pad[q_pad]
        buckets.append(Bucket(q_pad=q_pad, n_blocks=len(idxs), offset=pos))
        for k, i in enumerate(idxs):
            start = int(offsets[i])
            perm[start : start + qs[i]] = pos + k * q_pad + np.arange(qs[i])
        pos += q_pad * len(idxs)

    return ConeLayout(
        l=dims.l,
        buckets=tuple(buckets),
        degree=dims.degree,
        m_orig=dims.dim,
        m_pad=int(pos),
        perm=tuple(int(i) for i in perm),
    )
