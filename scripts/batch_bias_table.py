"""Render scripts/batch_bias_results.jsonl as the STATUS.md markdown table
(blocked-Gibbs bias measurement, SURVEY §7 hard part 2)."""
import json
import os
from collections import defaultdict

path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "batch_bias_results.jsonl")
rows = [json.loads(ln) for ln in open(path) if ln.strip()]
by = defaultdict(dict)
for r in rows:
    if not r.get("r"):
        continue
    by[(r["workload"], r["batch"])][r["seed"]] = r["r"]["f1"]

print("| workload | batch | F1 (per seed) |")
print("|---|---|---|")
for (wl, b) in sorted(by):
    f1s = " / ".join(f"{by[(wl, b)][s]:.3f}" for s in sorted(by[(wl, b)]))
    print(f"| {wl} | {b} | {f1s} |")
