#!/bin/bash
# Round-4 TPU queue, part 6: breadth protocol under the flagship OnA
# configuration. Part 4's no-OnA breadth run showed per-sequence J
# collapse when objects move far from their frame-0 position (random
# init + no re-adaptation has no tracking mechanism); OnA refits every
# 5 frames are what carries tracking in this framework (the disk 480p
# OnA run scores J=0.907 under the same random-init protocol). This
# records the breadth artifact's quality row under that protocol, plus
# its own program-count bound (OnA window-count bucketing at 4).
# TIMED — keep the host quiet.
set -x
cd "$(dirname "$0")/.."
run() { name=$1; shift; echo "=== $name start $(date +%T) ==="; timeout 14400 "$@"; echo "=== $name exit $? $(date +%T) ==="; }

run breadth_ona python scripts/tpu_breadth_eval.py --ona \
    --out-suffix _ONA

echo "QUEUE_R4_PART6_DONE $(date +%T)"
