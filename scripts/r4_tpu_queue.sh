#!/bin/bash
# Round-4 TPU queue, part 1: the two 480p trainings (detection parent+meta,
# dense meta with hard tasks), then the artifact runs that need their
# checkpoints, then the timed benches (serialized; timed sections last so
# host-side CPU work can overlap the training phases only).
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# 1. detection: 2000-iter parent + 150-iter meta on the shared disk tree
#    (verdict item 1 — the COCO-seed + meta-eval analogue)
run det_meta480 python scripts/exp_det_meta_480p.py \
    --work /tmp/det480 --parent-iters 2000 --meta-iters 150

# 2. dense 480p meta-training with the hard train/held protocol
#    (verdict items 2 prerequisite + 8)
run meta480 python scripts/exp_meta_480p_tpu.py \
    --iters 300 --save /tmp/meta480_ckpt_r4

# 3. detection disk protocol with parent+meta checkpoints, warm pass,
#    per-frame J attribution (verdict item 1 closure)
run det_disk python scripts/tpu_e2e_disk_480p.py --arch MaskRCNN \
    --tree /tmp/det480/DAVIS \
    --parent-ckpt /tmp/det480/parent2000/parent_final.ckpt \
    --meta-ckpt /tmp/det480/meta/last_meta_iter.ckpt \
    --passes 2 --per-frame-j --tag maskrcnn_meta

# 4. J&F-vs-T sweep with the meta checkpoint, easy + hard held-out
#    (verdict items 2 + 8)
run sweep_jf python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r4/last_meta_iter.ckpt
run sweep_jf_rand python scripts/sweep_jf_vs_t.py --steps 1 10 50 500
run sweep_jf_hard python scripts/sweep_jf_vs_t.py \
    --ckpt /tmp/meta480_ckpt_r4/last_meta_iter.ckpt --hard --steps 10 50

echo "QUEUE_R4_PART1_DONE $(date +%T)"
