#!/bin/bash
# Round-4 TPU queue, part 6: heterogeneous-tree eval under the
# flagship OnA configuration. Part 4's no-OnA breadth/ytvos runs
# showed per-sequence J collapse when objects move far from their
# frame-0 position (random init + no re-adaptation has no tracking
# mechanism); OnA refits every 5 frames are what carries tracking in
# this framework (the disk 480p OnA run scores J=0.907 under the same
# random-init protocol). TIMED — keep the host quiet.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

# YT-VOS layout under the flagship OnA protocol. The object groups in
# this tree are all single-object (YT-VOS groups objects by shared
# entry frame), so the cold cost is two fused-OnA programs (one per
# shape bucket) — the full breadth tree's 2x3 (bucket x object-count)
# OnA compile matrix does not fit the remaining round budget and the
# tracking-rescue question is the same.
run ytvos_ona python scripts/tpu_ytvos_480p.py --ona --out-suffix _ONA

echo "QUEUE_R4_PART6_DONE $(date +%T)"
