"""BASELINE.md 1,024-particle measurements (VERDICT r3 item 5, r4 item 1).

(a) hospital-100k with 1,024 particles — exact-Gibbs COLLAPSED path,
    routed through the B-row batched PG drivers (round 5: pg_row_step
    inside scan_init_batched/scan_sweep_class_batched), so P=1024 costs
    what the MH batched sweep costs.
(b) hospital-1k with P in {16, 64} and the collapse DISABLED — times the
    real vmapped particle path (the one every audit-failing model uses;
    reference semantics row_inference.jl:143-165), batched (B x P
    enumerations per dispatch) and, for comparison, the round-4
    row-sequential form (batch=1).
(c) equal-P collapsed-vs-vmapped F1 on the same workload/seed set — the
    distributional-equivalence record (VERDICT r4 weak 2; the in-suite pin
    is tests/test_pg_batched.py).

Appends one JSON line per run to bench_results/pg_runs.jsonl. `log_ml` is
Engine.log_ml — the SMC initialization log-marginal-likelihood estimate of
THAT run's path (collapsed: sum of block logZs; vmapped: logsumexp-mean of
particle weights + inter-block resampling terms; batched: ramp + batched +
replayed rows, each row once). On audit-passing models the two estimators
agree whenever the sampled chains coincide (peaked posteriors), so similar
values across paths are expected — equality is asserted exactly on a
latent-free model in tests/test_pg_batched.py.

Usage (TPU): python scripts/pg_measurements.py [--which a,b,c]
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


def run(tag, seed=0, **kw):
    import jax

    import hospital
    from pclean_tpu.analysis import evaluate_accuracy_device
    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine
    from pclean_tpu.utils import device_sync

    cm, config, dirty, clean, query, sweeps = hospital.setup(**kw)
    eng = Engine(cm, config)
    arenas, params = init_state(cm, jax.random.PRNGKey(seed))
    device_sync(params)
    t0 = time.time()
    arenas, params, key = eng.initialize(jax.random.PRNGKey(seed + 1),
                                         arenas, params)
    device_sync(arenas)
    t_init = time.time() - t0
    f1_init = round(evaluate_accuracy_device(cm, arenas, params, dirty,
                                             clean, query)["f1"], 4)
    t1 = time.time()
    arenas, params, key = eng.run(key, arenas, params)
    device_sync(arenas)
    t_sweep = time.time() - t1
    res = evaluate_accuracy_device(cm, arenas, params, dirty, clean, query)
    n = len(next(iter(dirty.values())))
    collapsed = eng.exact_accept and eng.config.collapse_exact_pg
    rec = {"tag": tag, "rows": n, "seed": seed,
           "config": {k: v for k, v in kw.items()},
           "path": ("collapsed" if collapsed else "vmapped")
           + ("-batched" if config.batch_rows > 1 else "-sequential"),
           "f1": round(res["f1"], 4), "f1_init": f1_init,
           "env": {k: os.environ[k] for k in
                   ("PCLEAN_MM", "JAX_DEFAULT_MATMUL_PRECISION")
                   if k in os.environ},
           "init_sec": round(t_init, 2), "sweep_sec": round(t_sweep, 2),
           "rows_per_sec": round(n / (t_init + t_sweep), 2),
           "log_ml": float(getattr(eng, "log_ml", float("nan")))}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


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
        # BASELINE.md: hospital scaled to 100k rows, 1,024 particles —
        # batched collapsed PG (VERDICT r4 item 1 target: >= 2,000 rows/s)
        run("hospital_100k_p1024_collapsed_b4096", repeat=100,
            particles=1024, batch=4096)
    if "b" in which:
        # the full vmapped particle path, collapse forced off:
        # batched (round 5) vs the round-4 row-sequential form
        for P in (16, 64):
            run(f"hospital_1k_p{P}_vmapped_b64", particles=P, batch=64,
                collapse_exact_pg=False)
        run("hospital_1k_p16_vmapped_seq", particles=16,
            collapse_exact_pg=False)
    if "c" in which:
        # equal-P collapsed vs vmapped on identical workload/seeds
        # (distributional F1 match expected on this audit-passing model)
        for seed in (0, 1, 2):
            run("hospital_1k_p16_collapsed_b64_eqp", seed=seed,
                particles=16, batch=64)
            run("hospital_1k_p16_vmapped_b64_eqp", seed=seed,
                particles=16, batch=64, collapse_exact_pg=False)
    if "d" in which:
        # diagnostic: does the vmapped F1 deficit appear on the
        # SEQUENTIAL vmapped path too (more seeds), and does it track
        # init vs sweep (f1_init)?
        for seed in (3, 4):
            run("hospital_1k_p16_vmapped_b64_eqp", seed=seed,
                particles=16, batch=64, collapse_exact_pg=False)
        for seed in (1, 2):
            run("hospital_1k_p16_vmapped_seq", seed=seed, particles=16,
                collapse_exact_pg=False)


if __name__ == "__main__":
    main()
