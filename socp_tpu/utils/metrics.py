"""Unified benchmark-metric schema (BASELINE.json `metric`).

Every benchmark entry point (bench.py, scripts/bench_all.py,
scripts/scaling_harness.py) emits records through `metric_record` so the
primary contract metrics — IPM iterations/s, KKT factorize ms, KKT solve
ms — appear under the SAME keys at 1 chip, 1 host, and N (virtual) hosts,
instead of three per-script schemas (round-2 verdict missing #5).

A record always carries every schema key (null when a given bench cannot
measure it) so downstream tooling can diff runs without key juggling.
"""

from __future__ import annotations

import json
import sys

SCHEMA = "socp_tpu_bench_v1"

# the contract metrics + utilization axes, always present:
_KEYS = (
    "solves_per_s",            # instance throughput (batched configs)
    "iters_per_s",             # IPM iterations/s (BASELINE primary)
    "kkt_factor_ms",           # KKT factorize ms (BASELINE primary)
    "kkt_solve_ms",            # KKT back-solve ms (BASELINE primary)
    "lockstep_iter_ms",        # wall ms per batched lockstep iteration
    "mfu_bf16_pct",            # achieved MXU bf16 vs device peak
    "achieved_vs_attainable_pct",  # vs the measured roofline ceiling
    "mesh_devices",            # devices the run spanned (1 = single chip)
)


def metric_record(config: str, metric: str, value: float, unit: str,
                  vs_baseline: float | None = None, **fields) -> dict:
    """Build one schema record; unknown axes default to None.

    Extra keyword fields outside the schema (batch sizes, statuses, ...)
    pass through untouched.
    """
    rec = {
        "schema": SCHEMA,
        "config": config,
        "metric": metric,
        "value": round(float(value), 6),
        "unit": unit,
        "vs_baseline": (round(float(vs_baseline), 2)
                        if vs_baseline is not None else None),
    }
    for k in _KEYS:
        v = fields.pop(k, None)
        if v is None:
            rec[k] = None
        elif k == "mesh_devices":
            rec[k] = int(v)
        else:
            rec[k] = round(float(v), 4)
    rec.update(fields)
    return rec


def emit(rec: dict, stream=None) -> None:
    """Print one JSON line (stdout by default — the driver contract)."""
    print(json.dumps(rec), file=stream or sys.stdout, flush=True)
