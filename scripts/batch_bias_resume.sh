#!/bin/bash
# Resume the blocked-Gibbs bias sweep (scripts/batch_bias_sweep.sh) after an
# interruption: append only the configs not already present in the results
# file. Same protocol: F1 parity of batch_rows on hospital (2 seeds) + rents.
cd "$(dirname "$0")/.."
OUT=scripts/batch_bias_results.jsonl
have() { grep -q "\"workload\": \"$1\", \"batch\": $2, \"seed\": $3" "$OUT"; }
for B in 1 8 64 512; do
  for S in 0 1; do
    have hospital "$B" "$S" && continue
    echo "hospital batch=$B seed=$S" >&2
    line=$(timeout 2400 python experiments/hospital.py --json --batch "$B" --seed "$S" 2>/dev/null | tail -1)
    [ -n "$line" ] && echo "{\"workload\": \"hospital\", \"batch\": $B, \"seed\": $S, \"r\": $line}" >> "$OUT"
  done
done
for B in 1 8 64 512; do
  have rents "$B" 0 && continue
  echo "rents batch=$B" >&2
  line=$(timeout 3600 python experiments/rents.py --json --batch "$B" --seed 0 2>/dev/null | tail -1)
  [ -n "$line" ] && echo "{\"workload\": \"rents\", \"batch\": $B, \"seed\": 0, \"r\": $line}" >> "$OUT"
done
echo DONE >&2
