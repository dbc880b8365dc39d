"""Benchmark entry point: the three golden workloads + a scaled config,
end-to-end on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The headline metric is the BASELINE.md scaled config (hospital tiled to
100k rows); the extras carry driver-checkable F1 + timing for all three
reference workloads (reference CI runs all three: .travis.yml:9-15).

Survivability contract (round-3 fix for the empty BENCH_r02): the bench
holds itself to a hard wall-clock budget (PCLEAN_BENCH_BUDGET_SEC, default
1200 s) enforced by a daemon watchdog thread. Results are recorded
incrementally as each workload finishes; when the budget expires — even if
the main thread is wedged inside a device RPC that Python signals cannot
interrupt — the watchdog prints the final JSON line from everything that
completed and hard-exits. SIGTERM gets the same treatment, so a driver
timeout can no longer yield an empty file. Workloads run in fixed order
(hospital -> scaled 100k -> flights -> rents) so the headline completes
earliest after the shared first-compile warmup, and the warm pass is
skipped when the remaining budget is tight.

Protocol per workload: build the compiled model, load/compile every step
program with one full throwaway pass (small workloads only), then time a
fresh inference run with true execution barriers (utils.device_sync — NOT
block_until_ready, which lies on tunneled PJRT backends) and evaluate F1.
The scaled config runs unwarmed: one-time program load amortizes into the
run and is reported inside its init_sec.

vs_baseline: the reference repo publishes no numbers (BASELINE.md). The
anchor is the AISTATS 2021 paper's only stated throughput — Lew et al.,
"PClean: Bayesian Data Cleaning at Scale with Domain-Specific Probabilistic
Programming" (PMLR v130), which reports cleaning a 2.2M-row dataset in
~7.5 hours on single-core CPU, ≈ 81 rows/s — on a *lighter* per-row model
(Medicare physician) than hospital, so the ratio is conservative for the
hospital headline. The raw measurements are all included so the anchor can
be re-based if a measured Julia run of these exact workloads ever exists.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "experiments"))

# Lew et al. AISTATS 2021 (PMLR v130): 2.2M rows / ~7.5 h single-core Julia.
JULIA_BASELINE_ROWS_PER_SEC = 81.0
BASELINE_ANCHOR = "AISTATS21 paper: 2.2M rows in ~7.5h single-core (~81 rows/s)"

BUDGET_SEC = float(os.environ.get("PCLEAN_BENCH_BUDGET_SEC", "1200"))
_T_START = time.time()

# Shared mutable record of everything measured so far; the watchdog and the
# normal exit path both read it.  Guarded by _LOCK; _EMITTED ensures the one
# JSON line is printed exactly once no matter which path wins.
_WL: dict = {}
_LOCK = threading.Lock()
_EMITTED = threading.Event()


def _remaining():
    return BUDGET_SEC - (time.time() - _T_START)


def _log(msg):
    print(f"[bench +{time.time() - _T_START:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def emit(reason):
    """Print the single JSON line from whatever has completed. Idempotent."""
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    with _LOCK:
        wl = dict(_WL)
    head = wl.get("hospital_100k")
    if head and "rows_per_sec" in head and head.get("rows_per_sec"):
        metric, value = "hospital_100k_rows_cleaned_per_sec", head["rows_per_sec"]
    elif wl.get("hospital", {}).get("rows_per_sec"):
        # scaled config didn't finish: fall back to the reference-config
        # hospital number so the record is never empty
        head = wl["hospital"]
        metric, value = "hospital_rows_cleaned_per_sec", head["rows_per_sec"]
    else:
        head = {}
        metric, value = "hospital_100k_rows_cleaned_per_sec", 0.0
    line = {
        "metric": metric,
        "value": value,
        "unit": "rows/s",
        "vs_baseline": round(value / JULIA_BASELINE_ROWS_PER_SEC, 2),
        "baseline_anchor": BASELINE_ANCHOR,
        "budget_sec": BUDGET_SEC,
        "elapsed_sec": round(time.time() - _T_START, 1),
        "exit_reason": reason,
        "workloads": wl,
    }
    for name in ("hospital", "flights", "rents", "hospital_100k",
                 "scaled_1m"):
        if name in wl and "f1" in wl[name]:
            line[f"{name}_f1"] = wl[name]["f1"]
        if name in wl and "rows_per_sec" in wl[name]:
            line[f"{name}_rows_per_sec"] = wl[name]["rows_per_sec"]
    print(json.dumps(line), flush=True)


def _watchdog():
    # A plain daemon thread: immune to the main thread being stuck inside a
    # blocking PJRT RPC (where Python-level signal handlers never run).
    while not _EMITTED.is_set():
        if _remaining() <= 0:
            _log("budget expired — emitting partial results and exiting")
            emit("budget_expired")
            sys.stdout.flush()
            os._exit(0)
        time.sleep(min(5.0, max(0.5, _remaining())))


def _on_sigterm(signum, frame):
    emit("sigterm")
    sys.stdout.flush()
    os._exit(0)


def run_workload(setup_fn, obs_class, warm, seed=0, **setup_kw):
    import jax

    from pclean_tpu.analysis import evaluate_accuracy_device
    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine
    from pclean_tpu.utils import device_sync

    cm, config, dirty, clean, query, sweeps = setup_fn(**setup_kw)
    eng = Engine(cm, config)
    if warm:
        a, p = init_state(cm, jax.random.PRNGKey(99))
        a, p, k = eng.initialize(jax.random.PRNGKey(98), a, p)
        a, p, k = eng.run(k, a, p)
        device_sync(a)
    arenas, params = init_state(cm, jax.random.PRNGKey(seed))
    device_sync(params)
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    arenas, params, key = eng.initialize(key, arenas, params)
    device_sync(arenas)
    t_init = time.time() - t0
    t1 = time.time()
    arenas, params, key = eng.run(key, arenas, params)
    device_sync(arenas)
    t_sweep = time.time() - t1
    elapsed = time.time() - t0
    results = evaluate_accuracy_device(cm, arenas, params, dirty, clean,
                                       query)
    n_rows = len(next(iter(dirty.values())))
    return {
        "f1": round(results["f1"], 4),
        "precision": round(results["precision"], 4),
        "recall": round(results["recall"], 4),
        "rows": n_rows,
        "sweeps": sweeps,
        # Headline metric = rows cleaned END-TO-END per second (init +
        # all sweeps), matching BASELINE.md's definition and the 81 rows/s
        # anchor's own (2.2M rows / 7.5 h wall). Round 3 reported
        # pass-throughput (rows x passes / wall), which inflates with sweep
        # count — kept as the separate pass_rows_per_sec field.
        "rows_per_sec": round(n_rows / elapsed, 2),
        "pass_rows_per_sec": round(n_rows * (1 + sweeps) / elapsed, 2),
        "init_sec": round(t_init, 2),
        "sweep_sec": round(t_sweep, 2),
        "total_sec": round(elapsed, 2),
        "warmed": warm,
    }


def main():
    import flights
    import hospital
    import rents
    import scaled

    # PCLEAN_BENCH_SET=name1,name2 restricts the run to those workloads
    # (rotation hook: lets a budget-capped driver still capture the long
    # configs across rounds). Default: all, in the fixed order below.
    only = {s for s in os.environ.get("PCLEAN_BENCH_SET", "").split(",")
            if s}

    def attempt(name, setup_fn, obs_class, min_budget, warm, **kw):
        """Run one workload; record its result (or error) incrementally.

        min_budget: skip (with a marker) when less than this many seconds
        remain — better an explicit skip than a half-run the watchdog
        truncates.  The warm pass is dropped first when budget is tight.
        """
        if only and name not in only:
            return
        rem = _remaining()
        if rem < min_budget:
            _log(f"{name}: skipped ({rem:.0f}s left < {min_budget}s needed)")
            with _LOCK:
                _WL[name] = {"skipped": f"{rem:.0f}s budget left"}
            return
        if warm and rem < 2.5 * min_budget:
            _log(f"{name}: dropping warm pass ({rem:.0f}s left)")
            warm = False
        _log(f"{name}: starting (warm={warm}, {rem:.0f}s left)")
        try:
            res = run_workload(setup_fn, obs_class, warm, **kw)
            with _LOCK:
                _WL[name] = res
            _log(f"{name}: done {res}")
        except Exception as e:  # noqa: BLE001
            # one crashed workload (e.g. a tunneled-worker kill mid-run) must
            # not zero out every other measurement in the JSON line
            with _LOCK:
                _WL[name] = {"error": f"{type(e).__name__}: {e}"[:300],
                             "f1": 0.0, "rows_per_sec": 0.0}
            _log(f"{name}: FAILED {_WL[name]['error']}")

    # Fixed order: the warmed hospital run pays the shared first-compile cost
    # and anchors the record; the scaled headline goes second so it completes
    # even if the long rents tail would blow the budget.
    attempt("hospital", hospital.setup, "Record", min_budget=120, warm=True)
    # BASELINE.md scaled config: hospital tiled to 100k synthetic rows,
    # batch-4096 blocked Gibbs with per-row self-exclusion (F1 0.9030 at
    # B=256, 1024 AND 4096, measured end-to-end 2026-08-19, matching
    # B=64's 0.902; B=4096 measured 8.1 s total / 12,341 rows-cleaned/s — co-reference blindness is bounded at ~2% even at maximal
    # batch, tests/test_coref_blindness.py). warm=True pays one throwaway
    # pass so the timed run measures inference, not program loading;
    # attempt() drops the warm pass automatically when the remaining budget
    # is tight (then init_sec absorbs program loads). The 1,024-particle PG
    # config runs the same speed as MH when the exactness audit passes
    # (collapse_exact_pg): see bench_results/.
    attempt("hospital_100k", hospital.setup, "Record", min_budget=200,
            warm=True, repeat=100, batch=4096)
    # BASELINE.md's 1,024-particle config, driver-visible (VERDICT r4
    # item 1): collapsed-exact PG routed through the batched drivers
    # (pg_row_step), so P=1024 costs ~what the MH batched sweep costs.
    # Runs right after hospital_100k so the shared setup data is hot;
    # programs differ from MH's (separate AOT artifacts).
    attempt("hospital_100k_pg1024", hospital.setup, "Record",
            min_budget=150, warm=True, repeat=100, batch=4096,
            particles=1024)
    attempt("flights", flights.setup, "Obs", min_budget=90, warm=True)
    # rents at B=256 blocked Gibbs: F1 by batch over seeds 0/1/2
    # (scripts/batch_bias_results.jsonl 2026-08-19): B=1 0.689/0.682/0.683,
    # B=64 0.679/0.686/0.680, B=256 0.679/0.686/0.680 — batching is
    # accuracy-neutral on the hardest workload (one-count bias fixed,
    # co-reference blindness bounded), so the throughput config is clean.
    attempt("rents", rents.setup, "Obs", min_budget=150, warm=True,
            batch=256)
    # BASELINE.md 1M-row scaled config (VERDICT r4 item 2: driver-visible,
    # not min_budget-gated out of existence): B=4096 blocked Gibbs +
    # candidate compaction + batched birth allocation — the levers that
    # took hospital-100k to ~10k rows/s, ported. Single chip; the
    # N>=2-host version of the same model is exercised by dryrun_multichip
    # + the multihost tests. Runs unwarmed — program loads amortize into
    # its init_sec. min_budget reflects the measured round-5 cost (see
    # bench_results/), small enough to fit the default 1200 s budget after
    # the four bundled workloads.
    attempt("scaled_1m", scaled.setup, "Record", min_budget=500, warm=False,
            rows=1_000_000, batch=4096)

    try:
        import jax
        with _LOCK:
            _WL["device"] = str(jax.devices()[0])
    except Exception:  # noqa: BLE001
        pass
    emit("completed")


if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_sigterm)
    threading.Thread(target=_watchdog, daemon=True).start()
    main()
