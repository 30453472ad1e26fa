#!/bin/bash
# Round-4 continuation on-chip queue (TPU-exclusive: strictly serialized).
# Waits for any running pytest to finish first (1 CPU core; avoid contention).
set -x
cd /root/repo

# The suite run logs to /tmp/pytest_r4b.log and appends EXIT=<code> when done.
while [ -f /tmp/pytest_r4b.log ] && ! grep -q "EXIT=" /tmp/pytest_r4b.log; do
  sleep 30
done

echo "=== draft scale-4 qualification (parity + throughput) ==="
timeout 3600 python tools/qualify_draft4.py --out docs/BENCH_draft4.json

echo "=== train-step bench, face mask + cull, per tier ==="
for tier in strict high fast; do
  echo "--- tier $tier ---"
  GCFR_TIER=$tier GCFR_MASK=face timeout 3600 python tools/bench_train.py 3
done

echo "=== eval protocol e2e, fast tier with cull ==="
timeout 3600 python tools/bench_eval_protocol.py --precision fast

echo "=== queue done ==="
