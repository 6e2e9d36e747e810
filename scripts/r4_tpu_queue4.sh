#!/bin/bash
# Round-4 TPU queue, part 4: the artifacts queue part 2/3 never produced
# before the host reset wiped /tmp and both compile caches. TIMED
# sections — no host-side CPU work may run concurrently (CLAUDE.md).
# Compile caches are cold, so each phase pays its 480p compiles again.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# 2-object headline row (round-3 verdict item 10)
run multiobj python scripts/bench_multiobj.py

# breadth protocol: 10 seqs, 6 native resolutions, program-count bound
# (verdict item 3)
run breadth python scripts/tpu_breadth_eval.py

# YouTube-VOS-layout protocol at native resolutions (ROADMAP gap 4)
run ytvos python scripts/tpu_ytvos_480p.py

# headline refresh + warms the driver's bench compile cache
run bench python bench.py

echo "QUEUE_R4_PART4_DONE $(date +%T)"
