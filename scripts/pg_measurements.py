"""BASELINE.md 1,024-particle measurements (VERDICT r3 item 5).

(a) hospital-100k with 1,024 particles — the exact-Gibbs COLLAPSED path
    (collapse_exact_pg: one enumeration per row regardless of P, exact
    log-ML; engine/particles.py).
(b) hospital-1k with P in {16, 64} and the collapse DISABLED — times the
    real vmapped particle path (the one every audit-failing model uses;
    reference semantics row_inference.jl:143-165).

Appends one JSON line per run to bench_results/pg_runs.jsonl.

Usage (TPU): python scripts/pg_measurements.py [--which a,b]
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

OUT = os.path.join(REPO, "bench_results", "pg_runs.jsonl")


def run(tag, **kw):
    import jax

    import hospital
    from pclean_tpu.analysis import evaluate_accuracy_device
    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine
    from pclean_tpu.utils import device_sync

    cm, config, dirty, clean, query, sweeps = hospital.setup(**kw)
    eng = Engine(cm, config)
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    device_sync(params)
    t0 = time.time()
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    device_sync(arenas)
    t_init = time.time() - t0
    t1 = time.time()
    arenas, params, key = eng.run(key, arenas, params)
    device_sync(arenas)
    t_sweep = time.time() - t1
    res = evaluate_accuracy_device(cm, arenas, params, dirty, clean, query)
    n = len(next(iter(dirty.values())))
    rec = {"tag": tag, "rows": n, "config": {k: v for k, v in kw.items()},
           "collapsed": eng.exact_accept and eng.config.collapse_exact_pg,
           "f1": round(res["f1"], 4),
           "init_sec": round(t_init, 2), "sweep_sec": round(t_sweep, 2),
           "rows_per_sec": round(n / (t_init + t_sweep), 2),
           "log_ml": float(getattr(eng, "log_ml", float("nan")))}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="a,b")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU smoke shapes")
    args = ap.parse_args()
    which = set(args.which.split(","))
    if args.smoke:
        if "a" in which:
            run("smoke_a", rows=60, particles=32)
        if "b" in which:
            run("smoke_b", rows=60, particles=4, collapse_exact_pg=False)
        return
    if "a" in which:
        # BASELINE.md: hospital scaled to 100k rows, 1,024 particles
        run("hospital_100k_p1024_collapsed", repeat=100, particles=1024)
    if "b" in which:
        # the full vmapped particle path, collapse forced off
        for P in (16, 64):
            run(f"hospital_1k_p{P}_vmapped", particles=P,
                collapse_exact_pg=False)


if __name__ == "__main__":
    main()
