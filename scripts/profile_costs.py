"""Per-program utilization profile: XLA cost model x measured dispatch wall.

The tunneled PJRT backend does not return device-side trace events
(jax.profiler captures ~0 of the real device time through the transport),
so op-level TraceViewer breakdowns are unavailable here. This script takes
the complementary route that DOES work through the tunnel:

  1. build + warm every step program a workload's drivers dispatch,
  2. read each compiled program's XLA cost analysis (flops, bytes accessed,
     transcendentals) — the compiler's own per-program op-level roll-up,
  3. time repeated warm dispatches with true execution barriers,
  4. report achieved GFLOP/s and GB/s against the chip's peaks.

Output: one JSON line per workload with per-program
{name, calls_per_pass, wall_ms, flops, bytes, gbps, gflops, pct_hbm}.
PROFILE.md records the results and the reading.

Usage (TPU):  python scripts/profile_costs.py [--workloads hospital,rents]
                  [--rows N] [--batch B] [--repeats 5]
CPU smoke:    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python ... --rows 100
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))

# TPU v5e (lite) peaks: 394 TFLOP/s bf16 / 197 fp32-equivalent MXU,
# HBM 819 GB/s (public spec). The enumeration programs here are
# fp32-scalar/VPU-heavy, so HBM fraction is the meaningful axis.
HBM_PEAK_GBPS = 819.0


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)))


def profile_workload(name, setup_fn, batch, rows, repeats, **kw):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine
    from pclean_tpu.utils import device_sync

    cm, config, dirty, clean, query, sweeps = setup_fn(
        rows=rows, batch=batch, **kw)
    eng = Engine(cm, config)
    eng._aot.wrap = lambda nm, fn: fn  # lower the raw jit fns (no AOT)
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    arenas, params, key = eng.initialize(key, arenas, params)
    device_sync(arenas)

    B = max(1, config.batch_rows)
    progs = []
    for cid in cm.model.class_order:
        if B > 1:
            run, nb, seg_b = eng.scan_sweep_class_batched(cid, B)
            args = lambda k, run=run, seg_b=seg_b: (
                arenas, params, 0, jax.random.split(k, seg_b * B))
            calls = (nb + seg_b - 1) // seg_b
            pname = f"sweep[{cid}] B={B} seg_b={seg_b}"
        else:
            run, seg = eng.scan_sweep_class(cid)
            args = lambda k, run=run, seg=seg: (
                arenas, params, 0, jax.random.split(k, seg))
            calls = (cm.layouts[cid].capacity + seg - 1) // seg
            pname = f"sweep[{cid}] seq seg={seg}"
        progs.append((pname, run, args, calls))

    out = []
    for pname, run, mkargs, calls in progs:
        a = mkargs(jax.random.PRNGKey(7)) + (eng._interned_dev,)
        lowered = run._wrapped.lower(*a)
        comp = lowered.compile()
        flops, bts = _cost(comp)
        r = run(*mkargs(jax.random.PRNGKey(7)))  # warm (compile outside timing)
        device_sync(r[0] if isinstance(r, tuple) else r)
        t0 = time.time()
        for i in range(repeats):
            r = run(*mkargs(jax.random.PRNGKey(13 + i)))
        device_sync(r[0] if isinstance(r, tuple) else r)
        wall = (time.time() - t0) / repeats
        out.append({
            "name": pname, "calls_per_pass": calls,
            "wall_ms": round(wall * 1e3, 2),
            "gflops": round(flops / 1e9, 3),
            "gbytes": round(bts / 1e9, 3),
            "achieved_gbps": round(bts / wall / 1e9, 1),
            "achieved_gflops": round(flops / wall / 1e9, 1),
            "pct_hbm_peak": round(100 * bts / wall / 1e9 / HBM_PEAK_GBPS, 1),
            "pass_share_ms": round(wall * 1e3 * calls, 1),
        })
    out.sort(key=lambda d: -d["pass_share_ms"])
    return {"workload": name, "rows": rows, "batch": B, "programs": out}


def main():
    import flights
    import hospital
    import rents

    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="hospital,flights,rents")
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()
    mods = {"hospital": hospital, "flights": flights, "rents": rents}
    for w in args.workloads.split(","):
        res = profile_workload(w, mods[w].setup, args.batch, args.rows,
                               args.repeats)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
