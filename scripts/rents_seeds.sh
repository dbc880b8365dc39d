#!/bin/bash
# Multi-seed rents accuracy record (VERDICT r3 item 4): >=3 seeds at B=1 and
# B=64 (plus B=256 for the batch-scaling decision) on the CURRENT code,
# appended to scripts/batch_bias_results.jsonl with a date tag. Run on TPU.
cd "$(dirname "$0")/.."
OUT=scripts/batch_bias_results.jsonl
TAG=$(date +%Y%m%d)
for B in "${BATCHES:-1 64 256}"; do :; done
for B in ${BATCHES:-1 64 256}; do
  for S in ${SEEDS:-0 1 2}; do
    echo "rents batch=$B seed=$S" >&2
    line=$(timeout 2400 python experiments/rents.py --json --batch "$B" --seed "$S" 2>/dev/null | tail -1)
    echo "{\"workload\": \"rents\", \"batch\": $B, \"seed\": $S, \"date\": \"$TAG\", \"r\": $line}" >> "$OUT"
  done
done
echo DONE >&2
