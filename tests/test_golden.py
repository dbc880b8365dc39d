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
    r = _run("flights.py", "--rows", "300", "--sweeps", "2")
    assert r["f1"] >= 0.50, r


@pytest.mark.slow
def test_rents_golden_f1():
    r = _run("rents.py", "--rows", "2000")
    assert r["f1"] >= 0.45, r
