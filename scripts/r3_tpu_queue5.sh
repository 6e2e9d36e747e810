#!/bin/bash
# Round-3 TPU queue, part 5: headline back on the measured-faster host
# window loop, device-resident sweep rows (deployment-parity protocol),
# and the controlled fused-vs-host A/B. Serialized (1 CPU core).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 10800 "$@"; echo "=== $name exit $? $(date +%T) ==="; }
run bench python bench.py
run fused_ab python scripts/bench_fused_ab.py
run sweep_resident python scripts/bench_sweep.py --resident
echo "QUEUE5 DONE $(date +%T)"
