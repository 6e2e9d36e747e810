#!/bin/bash
# Round-4 TPU queue, part 2: TIMED sections — no host-side CPU work may run
# concurrently (wall-clock timings; CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# serving-mode throughput incl. OnA row + tunnel bandwidth (items 4+5)
run stream python scripts/bench_stream.py
# early-stop A/B at the headline config (item 6)
run earlystop python scripts/bench_earlystop_ab.py
# 2-object headline row (item 10)
run multiobj python scripts/bench_multiobj.py
# breadth protocol: 10 seqs, 6 native resolutions, program count (item 3)
run breadth python scripts/tpu_breadth_eval.py
# headline refresh
run bench python bench.py

echo "QUEUE_R4_PART2_DONE $(date +%T)"
