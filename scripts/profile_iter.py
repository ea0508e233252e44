"""Op-level device-time breakdown of the batched dd IPM via jax.profiler.

Runs one steady-state chunk solve (the c3 contract shape) under a profiler
trace and aggregates device-lane op durations from the trace.json.gz —
the honest attribution (scan-differencing micro-benches are vulnerable to
XLA DCE-ing the untouched outputs of the op under test).

Usage: python scripts/profile_iter.py [--batch 128] [--n 100]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/socp_trace")
    ap.add_argument("--use-pallas", default=None, choices=["on", "off"])
    ap.add_argument("--invert", default=None, choices=["on", "off"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_socp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)

    import socp_tpu
    from socp_tpu import SolverConfig
    from socp_tpu.models.robust_ls import robust_ls_batch

    tf = {None: None, "on": True, "off": False}
    cfg = SolverConfig(factor_dtype="dd32", native_dd=True,
                       use_pallas=tf[args.use_pallas],
                       invert_factor=tf[args.invert])
    c, G, h, dims = robust_ls_batch(0, batch=args.batch, n=args.n)
    fn, dev_args, _ = socp_tpu.prepare_batch(c, G, h, dims, config=cfg,
                                             dtype=np.float64)
    t0 = time.time()
    out = fn(*dev_args)
    np.asarray(out[4])
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    out = fn(*dev_args)
    np.asarray(out[4])
    wall = time.time() - t0
    iters = int(np.asarray(out[5]).max())
    print(f"steady: {wall*1e3:.1f} ms, max iters {iters} "
          f"-> {wall/iters*1e3:.2f} ms/lockstep-iter", file=sys.stderr)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        out = fn(*dev_args)
        np.asarray(out[4])

    # newest trace.json.gz under the output dir
    traces = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        print("NO trace.json.gz found", file=sys.stderr)
        sys.exit(1)
    path = traces[-1]
    print(f"trace: {path}", file=sys.stderr)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])

    # device lanes: pid whose process_name mentions TPU/device
    pid_name = {}
    tid_name = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if re.search(r"TPU|device", n, re.I)
                and not re.search(r"host", n, re.I)}
    print(f"processes: {pid_name}", file=sys.stderr)

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        lane = tid_name.get((e["pid"], e["tid"]), "")
        if re.search(r"step|launch|infeed|outfeed", lane, re.I):
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # us
        # bucket: strip trailing .digits / digits
        key = re.sub(r"[.\d]+$", "", name)
        agg[key] += dur
        cnt[key] += 1
        total += dur

    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {total/1e3:.1f} ms "
          f"({total/1e3/max(iters,1):.3f} ms/iter)")
    for k, v in rows[: args.top]:
        print(f"{v/1e3:9.2f} ms  {v/total*100:5.1f}%  x{cnt[k]:<6d} {k}")


if __name__ == "__main__":
    main()
