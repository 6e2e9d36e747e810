#!/bin/bash
# Round-3 TPU queue, part 4: re-measure every runtime row on the
# round-3 fast path (fused-OnA single-program propagation, support-first
# upload overlap, jitted threshold+bit-pack, eval_stream pipelining).
# Serialized (1 CPU core).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 10800 "$@"; echo "=== $name exit $? $(date +%T) ==="; }
run bench python bench.py
run sweep python scripts/bench_sweep.py
run smallT python scripts/bench_smallT_attrib.py
run det_ona python scripts/bench_detection_ona.py
run roofline python scripts/bench_roofline.py
echo "QUEUE4 DONE $(date +%T)"
