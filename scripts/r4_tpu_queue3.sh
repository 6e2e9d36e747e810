#!/bin/bash
# Round-4 TPU queue, part 3: new-protocol artifact + hard-task training
# continuation. Runs after part 2's timed sections complete.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# YouTube-VOS-layout protocol at native heterogeneous resolutions
# (ROADMAP gap 4): mid-sequence objects, 5-stride stems, bucketing,
# submission zip, program-count bound
run ytvos python scripts/tpu_ytvos_480p.py

# hard-task meta-training continuation 300 -> 600 iters (pushes the
# hard-protocol held-out J past the round-4 0.231 checkpoint)
run meta480_cont python scripts/exp_meta_480p_tpu.py \
    --iters 600 --save /tmp/meta480_ckpt_r4 --resume

# refresh the hard J&F-vs-T rows with the continued checkpoint
# (programs cached from part 1b -> runtime only)
run sweep_jf_hard2 python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r4/last_meta_iter.ckpt --hard --steps 10 50

echo "QUEUE_R4_PART3_DONE $(date +%T)"
