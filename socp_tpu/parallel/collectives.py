"""Explicit ring collectives for the Schur reduction (SURVEY.md 7.3.5).

`lax.psum` lowers to one monolithic all-reduce: on a pod slice the whole
(p, p) Schur contribution crosses ICI as a single logical message, and XLA
schedules it after ALL local per-block factor work has finished.  The ring
formulation splits the reduction into ndev-1 `ppermute` hops of (p, p)
chunks, which (a) maps exactly onto the physical ICI ring, and (b) gives
the XLA latency-hiding scheduler ndev-1 independent async sends to overlap
with the local Cholesky panel work that follows the reduction — the
ring-attention-shaped dataflow the survey prescribes for >=70% multi-host
scaling.  Chunking (`n_chunks`) additionally pipelines the first hop
against the tail of the local Gram accumulation.

Both paths are numerically equivalent up to float reassociation of the
ndev-term sum (equivalence-tested on the faked 8-device mesh in
tests/test_schur.py), so either can ship; ring_allreduce is opt-in via
SolverConfig.ring_schur until pod-scale measurements exist.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def ring_allreduce(x: jax.Array, axis: str, ndev: int,
                   n_chunks: int = 1) -> jax.Array:
    """Sum `x` across the mesh axis via a ndev-1 hop unidirectional ring.

    Must run inside shard_map over `axis`.  For ndev == 1 it is the
    identity.  `n_chunks` > 1 splits x along its last dimension so chunk
    k's hop can overlap chunk k-1's local add (XLA async scheduling).

    BITWISE-REPLICATED result: a naive running ring sum would accumulate
    in each device's own rotation order, so float non-associativity would
    leave per-device results differing in low bits (violating the caller's
    replicated out_specs).  Instead each hop's message is stored into a
    slot indexed by its ORIGIN device, and the final reduction sums slots
    in fixed index order 0..ndev-1 — identical association on every
    device, hence identical bits.
    """
    if ndev <= 1:
        return x
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    me = lax.axis_index(axis)

    def ring_one(chunk):
        slots = jnp.zeros((ndev,) + chunk.shape, chunk.dtype)
        slots = lax.dynamic_update_index_in_dim(
            slots, chunk, jnp.int32(me), axis=0
        )
        msg = chunk
        for t in range(1, ndev):
            msg = lax.ppermute(msg, axis, perm)
            origin = jnp.int32((me - t) % ndev)
            slots = lax.dynamic_update_index_in_dim(slots, msg, origin,
                                                    axis=0)
        return jnp.sum(slots, axis=0)      # fixed order: bitwise replicated

    if n_chunks <= 1 or x.ndim == 0 or x.shape[-1] < n_chunks:
        return ring_one(x)
    # array_split tolerates an unequal last chunk (split would require an
    # exact division and trace-fail on e.g. p=6 with 4 chunks)
    pieces = jnp.array_split(x, n_chunks, axis=-1)
    return jnp.concatenate([ring_one(p) for p in pieces], axis=-1)
