#!/bin/bash
# Round-3 TPU run queue — serialized (1 host core; one tunnel).
# Each stage logs to /tmp/r3_<stage>.log and failures don't stop the queue.
# Usage: nohup bash scripts/r3_tpu_queue.sh > /tmp/r3_queue.log 2>&1 &
cd /root/repo
set -x
run() {
  name="$1"; shift
  echo "=== $name start $(date +%T) ==="
  timeout 7200 "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "=== $name exit $? $(date +%T) ==="
}
run bench        python bench.py
run stride       python scripts/bench_stride.py
run 100ona       python scripts/bench_100ona.py
run sweep500     python scripts/bench_sweep.py --only 500
run disk_os8     python scripts/tpu_e2e_disk_480p.py --stride 8
run disk_det     python scripts/tpu_e2e_disk_480p.py --arch MaskRCNN
run disk_warm    python scripts/tpu_e2e_disk_480p.py --stride 16 --passes 2
echo "QUEUE DONE $(date +%T)"
