#!/bin/bash
# Round-3 TPU queue, part 6: dense fine-tune step attribution (the headline's
# dominant cost), detection OnA fused-vs-host A/B under the pre-staged
# protocol, and protocol-consistent refreshes of the 100-OnA and stride fps
# rows. Serialized (1 CPU core).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 10800 "$@"; echo "=== $name exit $? $(date +%T) ==="; }
run dense_ft_parts python scripts/bench_dense_ft_parts.py
run det_ona_host env FUSED=0 python scripts/bench_detection_ona.py
run det_ona_fused env FUSED=1 python scripts/bench_detection_ona.py
run 100ona python scripts/bench_100ona.py
run stride_fps python scripts/bench_stride.py --fps-only
run stream python scripts/bench_stream.py
run bench python bench.py
echo "QUEUE6 DONE $(date +%T)"
