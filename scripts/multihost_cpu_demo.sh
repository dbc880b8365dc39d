#!/bin/bash
# Launch the N-process CPU multi-host demo (see multihost_cpu_demo.py).
# NPROC=2 (default) or 4; 8 global virtual devices split evenly.
set -u
cd "$(dirname "$0")/.."
PORT=${PORT:-7621}
NPROC=${NPROC:-2}
DEV_PER_PROC=$((8 / NPROC))
export PCLEAN_COORDINATOR=localhost:$PORT PCLEAN_NUM_PROCESSES=$NPROC
# processes share the AOT dir; exported programs also pin a device
# assignment the other process can't address — trace fresh instead
export PCLEAN_AOT_CACHE=0
# must be set before the interpreter starts: sitecustomize force-registers
# the TPU PJRT plugin at startup (in-process env mutation is too late)
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
export XLA_FLAGS="--xla_force_host_platform_device_count=$DEV_PER_PROC"
PIDS=()
for ((i = 0; i < NPROC; i++)); do
  PCLEAN_PROCESS_ID=$i timeout 600 python scripts/multihost_cpu_demo.py &
  PIDS+=($!)
done
RC=0
for p in "${PIDS[@]}"; do
  wait "$p" || RC=$((RC + 1))
done
exit $RC
