"""Multi-host runtime: jax.distributed bootstrap + pod mesh construction.

SURVEY.md section 2.3 (comm backend row): the framework's distributed layer
is JAX collectives over ICI/DCN — there is no MPI/NCCL runtime to manage.
What remains host-side is (a) bringing up the jax.distributed coordinator
so all hosts join one computation, and (b) building meshes whose axes map
onto the physical interconnects: intra-slice axes ride ICI (fast — use for
the block-Schur psum), the inter-slice/host axis rides DCN (slower — use
for scenario/consensus traffic, which is one small pmean per ADMM round).

Failure semantics (SURVEY.md section 5): a host that dies takes the
computation down; restart re-runs `initialize()` and resumes from the last
`utils.checkpoint.SolverCheckpoint` — standard JAX coordinator semantics,
deliberately not over-built.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host computation (no-op for a single process).

    With no arguments, relies on the TPU pod's automatic environment
    discovery (the standard path on Cloud TPU slices); arguments are for
    manual bring-up.  Must run before any computation touches devices —
    in particular BEFORE anything calls jax.devices()/process_count(),
    which initialize the local backend and make distributed.initialize()
    raise.  We therefore check the distributed client state directly
    instead of probing process_count() first.
    """
    # Prefer the public API; fall back to the private global state on jax
    # versions without is_initialized (guarded — a missing attribute just
    # means "assume not initialized" and let initialize() itself error).
    try:
        if jax.distributed.is_initialized():
            return  # coordinator already up (idempotent call)
    except AttributeError:
        try:
            from jax._src import distributed as _distributed

            if getattr(_distributed.global_state, "client", None) is not None:
                return
        except Exception:
            pass
    if coordinator_address is None and num_processes is None and process_id is None:
        import os

        env_keys = (
            "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
        # TPU_WORKER_HOSTNAMES is set even on single-host TPU VMs (verified
        # on the dev box); it only implies a pod when it lists >1 worker.
        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        multi_worker = len([w for w in workers.split(",") if w.strip()]) > 1
        if not multi_worker and not any(k in os.environ for k in env_keys):
            return  # no coordinator info anywhere: single-process local run
    # Errors deliberately propagate — swallowing RuntimeError ("must be
    # called before backends are initialized") would let a pod silently run
    # as N independent single-host processes while appearing to succeed.
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(
    scenario_axis: str = "scenario",
    block_axis: str = "blocks",
    scenario_size: Optional[int] = None,
) -> Mesh:
    """2-D mesh for the multi-host solver layouts.

    Axis 0 (`scenario_axis`) spans hosts/slices — DCN traffic: one
    consensus mean per ADMM outer round.  Axis 1 (`block_axis`) spans each
    host's chips — ICI traffic: the per-iteration Schur psum.  By default
    the scenario axis has one entry per process, so block-Schur collectives
    never cross DCN.
    """
    # Group devices by owning process, not by global id order: on some pod
    # topologies jax.devices() does not list each process's local devices
    # contiguously, and a naive reshape would put the `blocks` axis across
    # DCN, defeating the ICI-only design for the per-iteration Schur psum.
    devs = np.asarray(sorted(jax.devices(), key=lambda d: (d.process_index, d.id)))
    n_proc = scenario_size or max(jax.process_count(), 1)
    if devs.size % n_proc != 0:
        raise ValueError(
            f"{devs.size} devices not divisible into {n_proc} scenario rows"
        )
    grid = devs.reshape(n_proc, devs.size // n_proc)
    return Mesh(grid, (scenario_axis, block_axis))
