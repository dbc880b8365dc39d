"""Blocked-Gibbs F1 parity at batch_rows > 1 (VERDICT r1 item 9; SURVEY §7
hard part 2).

batch_rows=B proposes B rows in parallel against a frozen relational
snapshot (engine/smc.py::scan_init_batched / scan_sweep_batched), replaying
entity-birthing rows sequentially — an approximation whose accuracy must
match the exact sequential scan (batch_rows=1). This test runs the hospital
workload both ways at batch 64 and asserts the batched F1 (a) clears the
same calibrated floor as the sequential golden test and (b) sits within
Monte-Carlo error of the sequential run.

Calibration (CPU, seeds 0/1, 2026-08-17): batch=1 F1 0.925/0.925,
batch=64 F1 0.919/0.925; TPU full 1000 rows: batch=1 0.904/0.908 vs
batch {8,64,512} recorded in STATUS.md's bias table.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> dict:
    cmd = [sys.executable, os.path.join(REPO, "experiments", "hospital.py"),
           "--json", "--rows", "200", *args]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800,
                         cwd=REPO)
    assert out.returncode == 0, f"hospital failed:\n{out.stderr[-2000:]}"
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_hospital_batch64_f1_parity():
    seq = _run()
    batched = _run("--batch", "64")
    assert batched["f1"] >= 0.87, batched
    assert abs(batched["f1"] - seq["f1"]) <= 0.06, (seq["f1"], batched["f1"])
