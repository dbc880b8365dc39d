"""Golden-workload regression tests (VERDICT r1 item 5; SURVEY §4).

The reference's only verification is CI smoke-running the three experiment
scripts without asserting accuracy (/root/reference/.travis.yml:9-15).
These tests upgrade that: each bundled workload runs end-to-end (truncated
for CPU runtime) and must clear an F1 floor chosen ~0.05 below the worst of
multi-seed calibration runs, so a refactor that silently degrades inference
accuracy fails the suite.

Calibration (CPU, seeds 0/1, 2026-08-17):
  hospital --rows 200            F1 0.925 / 0.925
  flights  --rows 300 --sweeps 2 F1 0.567 / 0.571  (truncation hurts dedup;
                                 full 2376-row dataset reaches ~0.90)
  rents    --rows 2000           F1 0.528 / 0.507  (full 50k reaches ~0.69)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "experiments", script),
           "--json", *args]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                         cwd=REPO)
    assert out.returncode == 0, f"{script} failed:\n{out.stderr[-2000:]}"
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.slow
def test_hospital_golden_f1():
    r = _run("hospital.py", "--rows", "200")
    assert r["f1"] >= 0.87, r


@pytest.mark.slow
def test_flights_golden_f1():
    # floor raised 0.50 -> 0.55 (VERDICT r3 item 6) per the seeds-0/1
    # calibration above (0.567/0.571)
    r = _run("flights.py", "--rows", "300", "--sweeps", "2")
    assert r["f1"] >= 0.55, r


@pytest.mark.slow
def test_rents_golden_f1():
    # floor raised 0.45 -> 0.48 (VERDICT r3 item 6) per the seeds-0/1
    # calibration above (0.528/0.507)
    r = _run("rents.py", "--rows", "2000")
    assert r["f1"] >= 0.48, r


# ---------------------------------------------------------------------------
# Full-dataset floors (VERDICT r2 weak item 5: the truncated floors above are
# necessarily loose — truncation hurts dedup — so a regression that halves
# full-data accuracy could pass them). These run the COMPLETE datasets with
# floors ~0.03-0.05 below measured full-data F1. All three run in default CI
# (VERDICT r4 item 7 removed the last env gate): minutes per test on CPU,
# also exercised on the TPU by bench.py whose BENCH_rNN record the driver
# keeps.
#
# Calibration (TPU v5e + CPU cross-check, 2026-08-18):
#   hospital full 1000 rows   F1 0.904 / 0.908 (seeds 0/1)  -> floor 0.86
#                             (132 s CPU -> gated)
#   flights  full 2376 rows   F1 0.888 (47 s CPU -> ungated: the truncated
#                             flights floor was the loosest in the suite)
#                                                           -> floor 0.84
#   rents    full 50k rows    F1 0.687 (91 s TPU, slower CPU -> gated)
#     floor 0.653 = 0.95 x 0.687, BASELINE.md's accuracy target verbatim
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_hospital_golden_f1_full():
    # ungated (VERDICT r3 item 6): ~132 s CPU is affordable in the suite,
    # and it makes CI assert full-data accuracy on 2 of 3 workloads
    r = _run("hospital.py")
    assert r["f1"] >= 0.86, r


@pytest.mark.slow
def test_flights_golden_f1_full():
    r = _run("flights.py")
    assert r["f1"] >= 0.84, r


@pytest.mark.slow
def test_rents_golden_f1_full():
    # ungated (VERDICT r4 item 7): rents is the accuracy-fragile workload,
    # so its full-data floor runs in default CI like hospital/flights
    # (batch=64 keeps the CPU runtime in the per-test minutes the suite
    # already pays for hospital-full; accuracy is batch-neutral per the
    # 3-seed record in scripts/batch_bias_results.jsonl).
    r = _run("rents.py", "--batch", "64")
    assert r["f1"] >= 0.653, r
