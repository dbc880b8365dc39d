#!/bin/bash
# Launch the 2-process CPU multi-host demo (see multihost_cpu_demo.py).
set -u
cd "$(dirname "$0")/.."
PORT=${PORT:-7621}
export PCLEAN_COORDINATOR=localhost:$PORT PCLEAN_NUM_PROCESSES=2
# two processes share the AOT dir; exported programs also pin a device
# assignment the other process can't address — trace fresh instead
export PCLEAN_AOT_CACHE=0
# must be set before the interpreter starts: sitecustomize force-registers
# the TPU PJRT plugin at startup (in-process env mutation is too late)
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
export XLA_FLAGS="--xla_force_host_platform_device_count=4"
PCLEAN_PROCESS_ID=0 timeout 600 python scripts/multihost_cpu_demo.py &
P0=$!
PCLEAN_PROCESS_ID=1 timeout 600 python scripts/multihost_cpu_demo.py &
P1=$!
wait $P0; R0=$?
wait $P1; R1=$?
exit $((R0 + R1))
