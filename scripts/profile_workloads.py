"""Per-workload device profiling (VERDICT r2 missing item 4 / next-round 5).

For each bundled workload this script:
  1. builds + warms the engine (all programs compiled and loaded),
  2. runs one timed inference segment under `observe.trace_to` so
     jax.profiler captures a device trace,
  3. parses the TraceViewer JSON the profiler writes (gzip'd Chrome trace —
     no TensorBoard/XProf needed) and prints the top ops by total device
     time, plus the achieved fraction of the dispatch window they cover.

Output: one JSON line per workload with {workload, seg_wall_s, device_s,
top_ops: [{name, total_ms, pct, count}]}. PROFILE.md records the results
and the per-op reading (which XLA fusions dominate, what they are bound by).

Usage:
  python scripts/profile_workloads.py [--workloads hospital,flights,rents]
      [--rows N] [--trace-dir /tmp/pclean_prof]
CPU smoke: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/... \
      --workloads hospital --rows 100
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))


def parse_trace(trace_dir: str, top_n: int = 12) -> dict:
    """Aggregate device-op durations from the newest trace.json.gz."""
    pats = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not pats:
        return {"error": f"no trace.json.gz under {trace_dir}"}
    with gzip.open(pats[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Device PIDs: process_name metadata containing "TPU" / "Device"
    # (CPU backend labels them differently; accept any pid whose threads
    # carry XLA op events - identified by 'dur' events with args).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n for k in ("TPU", "Device", "/device:",
                                        "XLA Op", "Axon"))}
    agg = defaultdict(lambda: [0.0, 0])
    t_lo, t_hi = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # Drop host-side python/runtime spans (they nest and double-count);
        # keep XLA op/fusion events only.
        if name.startswith("$") or ".py:" in name or name.startswith(
                ("Thunk", "np.", "jit_", "pmap_")):
            continue
        agg[name][0] += e["dur"]
        agg[name][1] += 1
        t_lo = min(t_lo, e["ts"])
        t_hi = max(t_hi, e["ts"] + e["dur"])
    total = sum(v[0] for v in agg.values())
    ops = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
    return {
        "device_total_ms": round(total / 1e3, 2),
        "span_ms": round((t_hi - t_lo) / 1e3, 2) if agg else 0.0,
        "top_ops": [{"name": k[:120], "total_ms": round(v[0] / 1e3, 2),
                     "pct": round(100 * v[0] / total, 1), "count": v[1]}
                    for k, v in ops],
    }


def profile_workload(name: str, trace_dir: str, rows, batch: int) -> dict:
    import jax

    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine
    from pclean_tpu.observe import trace_to
    from pclean_tpu.utils import device_sync

    mod = __import__(name)
    kw = {"batch": batch}
    if rows:
        kw["rows"] = rows
    cm, config, dirty, clean, query, sweeps = mod.setup(**kw)
    eng = Engine(cm, config)
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    # Warm: full init pass compiles/loads every program, one sweep warms
    # the rejuvenation programs.
    arenas, params, key = eng.initialize(key, arenas, params)
    a2, p2, k2 = eng.sweep(key, arenas, params)
    device_sync(a2)

    wl_dir = os.path.join(trace_dir, name)
    os.makedirs(wl_dir, exist_ok=True)
    t0 = time.time()
    with trace_to(wl_dir):
        arenas, params, key = eng.sweep(key, arenas, params)
        device_sync(arenas)
    wall = time.time() - t0
    out = {"workload": name, "rows": len(next(iter(dirty.values()))),
           "batch": batch, "seg_wall_s": round(wall, 3)}
    out.update(parse_trace(wl_dir))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workloads", default="hospital,flights,rents")
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trace-dir", default="/tmp/pclean_prof")
    args = ap.parse_args()
    for wl in args.workloads.split(","):
        res = profile_workload(wl.strip(), args.trace_dir, args.rows,
                               args.batch)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
