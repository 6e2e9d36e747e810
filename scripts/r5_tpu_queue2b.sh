#!/bin/bash
# Round-5 TPU queue, part 2b: re-measure after the fused on-device
# scoring change (engine/one_shot.py::score_merged_device) — the eager
# per-frame scoring loop was 42% of the detection path's all-in time and
# a large share of the dense disk-protocol paths. Same checkpoints, same
# trees, warm caches => J must be bit-identical, fps should move.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 7200 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

CKPT=/tmp/meta480_ckpt_r5/last_meta_iter.ckpt

# 1. detection attribution rerun: the 'score' phase should collapse
run det_attrib2 python scripts/bench_det_attrib.py

# 2. YT-VOS meta+OnA rerun (warm cache): fps with fused scoring
run ytvos_meta_ona2 python scripts/tpu_ytvos_480p.py \
    --ona --ckpt "$CKPT" --out-suffix _META_ONA \
    --cache-dir /tmp/jaxcache_ytvos_32wzhx2x

# 3. breadth meta+OnA rerun (warm cache): fps with fused scoring
run breadth_ona2 python scripts/tpu_breadth_eval.py \
    --ona --ckpt "$CKPT" --out-suffix _ONA \
    --cache-dir /tmp/jaxcache_breadth_ztftj0au

echo "QUEUE_R5_PART2B_DONE $(date +%T)"
