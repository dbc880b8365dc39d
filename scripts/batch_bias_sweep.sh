#!/bin/bash
# Blocked-Gibbs bias measurement (VERDICT r1 item 9; SURVEY §7 hard part 2):
# F1 parity of batch_rows ∈ {1,8,64,512} on hospital (2 seeds) + rents.
# Appends one JSON line per run to scripts/batch_bias_results.jsonl.
cd "$(dirname "$0")/.."
OUT=scripts/batch_bias_results.jsonl
: > "$OUT"
for B in 1 8 64 512; do
  for S in 0 1; do
    echo "hospital batch=$B seed=$S" >&2
    line=$(timeout 1800 python experiments/hospital.py --json --batch "$B" --seed "$S" 2>/dev/null | tail -1)
    echo "{\"workload\": \"hospital\", \"batch\": $B, \"seed\": $S, \"r\": $line}" >> "$OUT"
  done
done
for B in 1 8 64 512; do
  echo "rents batch=$B" >&2
  line=$(timeout 3600 python experiments/rents.py --json --batch "$B" --seed 0 2>/dev/null | tail -1)
  echo "{\"workload\": \"rents\", \"batch\": $B, \"seed\": 0, \"r\": $line}" >> "$OUT"
done
echo DONE >&2
