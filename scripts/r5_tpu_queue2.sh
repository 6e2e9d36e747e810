#!/bin/bash
# Round-5 TPU queue, part 2: attribution benches (run AFTER part 1 —
# they share the chip and the bench compile cache). Quiet host for the
# timed sections.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 7200 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# 1. Mask R-CNN all-in fps attribution (VERDICT r4 weak #3)
run det_attrib python scripts/bench_det_attrib.py

# 2. flagship fine-tune-step MFU attribution (VERDICT r4 weak #4)
run mfu_attrib python scripts/bench_mfu_attrib.py

# 3. BENCH_MULTIOBJ refresh: J over all 3 timed sequences (ADVICE r4)
run multiobj python scripts/bench_multiobj.py

echo "QUEUE_R5_PART2_DONE $(date +%T)"
