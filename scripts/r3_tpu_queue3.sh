#!/bin/bash
# Round-3 TPU queue, part 3: clean headline re-run + small-T attribution
# + detection accuracy evidence. Serialized (1 CPU core).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 10800 "$@"; echo "=== $name exit $? $(date +%T) ==="; }
run bench python bench.py
run smallT python scripts/bench_smallT_attrib.py
run disk_det_seeded python scripts/tpu_e2e_disk_480p.py --arch MaskRCNN --parent-iters 600
run det_meta python scripts/exp_det_meta_synth.py --tpu --parent-iters 150 --iters 100
echo "QUEUE3 DONE $(date +%T)"
