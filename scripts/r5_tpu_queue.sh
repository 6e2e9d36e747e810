#!/bin/bash
# Round-5 TPU queue, part 1.
# Ordering: training first (host CPU work may overlap it), then the
# checkpoint-dependent artifact runs, then the TIMED breadth-OnA matrix
# (quiet host). Each phase tolerates a prior-phase failure.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

CKPT=/tmp/meta480_ckpt_r5/last_meta_iter.ckpt

# 1. hard-task dense meta-training to 600 iters (round-4 part 3's
#    continuation was voided by the host reset; fresh run, resumable)
run meta480 python scripts/exp_meta_480p_tpu.py \
    --iters 600 --save /tmp/meta480_ckpt_r5 --resume \
    --out /tmp/meta480_r5.json

# 2. refresh the hard J&F-vs-T rows with the 600-iter checkpoint
run sweep_jf_hard python scripts/sweep_jf_vs_t.py \
    --ckpt "$CKPT" --hard --steps 10 50

# 3. meta-init rescue on the YT-VOS tree (VERDICT r4 missing #4): round 4
#    measured video02 as OnA-unrescuable from a RANDOM init (frame-0
#    acquisition failure, BENCH_YTVOS_ONA.json); re-evaluate the same tree
#    from the meta-learned init, +/- OnA. Reuses the surviving round-4
#    compile caches (programs depend on shapes, not weights), so both runs
#    are warm; cache_preexisting_entries keeps the program counts honest.
run ytvos_meta python scripts/tpu_ytvos_480p.py \
    --ckpt "$CKPT" --out-suffix _META \
    --cache-dir /tmp/jaxcache_ytvos_znepcuem
run ytvos_meta_ona python scripts/tpu_ytvos_480p.py \
    --ona --ckpt "$CKPT" --out-suffix _META_ONA \
    --cache-dir /tmp/jaxcache_ytvos_32wzhx2x

# 4. TIMED: breadth tree under the flagship OnA protocol from the
#    meta-learned init — the full 2-bucket x 3-object-count compile
#    matrix. Reuses the round-4 no-OnA breadth cache (fine-tune programs
#    shared; OnA window programs newly counted via the delta fix).
run breadth_ona python scripts/tpu_breadth_eval.py \
    --ona --ckpt "$CKPT" --out-suffix _ONA \
    --cache-dir /tmp/jaxcache_breadth_ztftj0au

# 5. random-init control for the same OnA matrix (warm: phase 4 compiled
#    every program) — closes the {init} x {OnA} attribution square with
#    the round-4 random/no-OnA row.
run breadth_ona_rand python scripts/tpu_breadth_eval.py \
    --ona --out-suffix _ONA_RAND \
    --cache-dir /tmp/jaxcache_breadth_ztftj0au

echo "QUEUE_R5_PART1_DONE $(date +%T)"
