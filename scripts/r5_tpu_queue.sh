#!/bin/bash
# Round-5 TPU queue, part 1 (prepared at the end of round 4).
# Ordering: trainings first (host CPU work may overlap them), then the
# checkpoint-dependent artifact runs, then TIMED breadth-OnA (quiet
# host). Each phase tolerates a prior-phase failure.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# 1. hard-task dense meta-training to 600 iters (round-4 part 3's
#    continuation was voided by the host reset; fresh run, resumable)
run meta480 python scripts/exp_meta_480p_tpu.py \
    --iters 600 --save /tmp/meta480_ckpt_r5 --resume \
    --out /tmp/meta480_r5.json

# 2. refresh the hard J&F-vs-T rows with the 600-iter checkpoint
run sweep_jf_hard python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r5/last_meta_iter.ckpt --hard --steps 10 50

# 3. meta-init rescue on the YT-VOS tree: round 4 measured the one
#    OnA-unrescuable video (video02: random-init frame-0 acquisition
#    failure, BENCH_YTVOS_ONA.json) — evaluate the same tree from the
#    meta-learned init to close that attribution with a number.
#    (Requires a --ckpt flag on tpu_ytvos_480p.py: load meta params via
#    the exp_meta_480p_tpu save format before eval — small edit.)
# run ytvos_meta python scripts/tpu_ytvos_480p.py --ona --out-suffix _META \
#     --ckpt /tmp/meta480_ckpt_r5/last_meta_iter.ckpt

# 4. TIMED: breadth tree under the flagship OnA protocol, full
#    2-bucket x 3-object-count compile matrix (budget ~2h cold)
run breadth_ona python scripts/tpu_breadth_eval.py --ona --out-suffix _ONA

echo "QUEUE_R5_PART1_DONE $(date +%T)"
