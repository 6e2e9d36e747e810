#!/bin/bash
# Round-3 TPU queue, part 2: detection-path accuracy evidence.
# Serialized single-chip runs (1 CPU core; never two compile-heavy procs).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 10800 "$@"; echo "=== $name exit $? $(date +%T) ==="; }
# 480p disk-backed Mask R-CNN protocol run, seeded by a from-scratch
# detection parent trained on held-out synthetic sequences (VERDICT item 5)
run disk_det_seeded python scripts/tpu_e2e_disk_480p.py --arch MaskRCNN --parent-iters 600
# detection meta-learning calibration with a parent seed (VERDICT item 7)
run det_meta python scripts/exp_det_meta_synth.py --tpu --parent-iters 150 --iters 100
echo "QUEUE3 DONE $(date +%T)"
