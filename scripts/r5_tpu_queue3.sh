#!/bin/bash
# Round-5 TPU queue, part 3 (best-effort): continue the hard-task
# meta-training 600 -> 1200 iters (hard held-out J was still climbing:
# 0.231 @300 -> 0.394 @600) and refresh the hard J&F-vs-T rows with the
# deeper checkpoint. Run AFTER part 2; bounded so the round can close.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 10800 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

run meta480_cont python scripts/exp_meta_480p_tpu.py \
    --iters 1200 --save /tmp/meta480_ckpt_r5 --resume \
    --out /tmp/meta480_r5b.json

run sweep_jf_hard2 python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r5/last_meta_iter.ckpt --hard --steps 10 50

echo "QUEUE_R5_PART3_DONE $(date +%T)"
