#!/bin/bash
# Round-4 TPU queue, part 5: regenerate the hard-task meta-training
# checkpoint (the host reset wiped /tmp, so part 3's 300->600-iter
# RESUME is impossible — this is a fresh run, sized by ITERS to fit the
# remaining wall clock). Training phases tolerate host CPU overlap
# (only TIMED bench sections require a quiet host); s_per_iter here is
# informational.
set -x
cd "$(dirname "$0")/.."
ITERS=${ITERS:-300}
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# hard-task 480p meta-training, fresh (easy+hard train mix, easy+hard
# held-out protocols; writes the result JSON to a side file so the
# committed 300-iter artifact is only replaced if this run is better)
run meta480_fresh python scripts/exp_meta_480p_tpu.py \
    --iters "$ITERS" --save /tmp/meta480_ckpt_r4 \
    --out /tmp/meta480_r4b.json

echo "QUEUE_R4_PART5_DONE $(date +%T)"
