#!/bin/bash
# Round-4 TPU queue, part 1b: resume after the axon tunnel dropped mid
# meta480 training (iter ~130/300; last_meta_iter.ckpt at iter 120).
# Phase 1 (det parent+meta 480p) completed before the drop — skipped here.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# 2 (resumed). dense 480p meta-training with the hard train/held protocol
run meta480 python scripts/exp_meta_480p_tpu.py \
    --iters 300 --save /tmp/meta480_ckpt_r4 --resume

# 3. detection disk protocol with parent+meta checkpoints, warm pass,
#    per-frame J attribution (verdict item 1 closure)
run det_disk python scripts/tpu_e2e_disk_480p.py --arch MaskRCNN \
    --tree /tmp/det480/DAVIS \
    --parent-ckpt /tmp/det480/parent2000/parent_final.ckpt \
    --meta-ckpt /tmp/det480/meta/last_meta_iter.ckpt \
    --passes 2 --per-frame-j --tag maskrcnn_meta

# 4. J&F-vs-T sweep with the meta checkpoint, easy + hard held-out
run sweep_jf python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r4/last_meta_iter.ckpt
run sweep_jf_rand python scripts/sweep_jf_vs_t.py --steps 1 10 50 500
run sweep_jf_hard python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r4/last_meta_iter.ckpt --hard --steps 10 50

echo "QUEUE_R4_PART1_DONE $(date +%T)"
