#!/bin/bash
# Round-5c on-chip queue (run AFTER the training soak frees the chip):
#  1. serve storms against the final dual-path kernel (high tier is +38%
#     vs the storms recorded in docs/BENCH_r05_requalify.json)
#  2. 862-image eval protocol with the column cull
#  3. profile attribution refresh (draft march/refine split post-cull)
#  4. column-chunk-width experiment (32 vs the shipping 64)
# Serialized: the TPU is exclusive.
set -x
cd /root/repo

timeout 1800 python tools/bench_serve.py --precision high --requests 64 --concurrency 8 --max-batch 8 --format png
timeout 1800 python tools/bench_serve.py --precision high --requests 64 --concurrency 8 --max-batch 8 --format jpeg
timeout 1800 python tools/bench_serve.py --precision high --tiers high,draft --requests 64 --concurrency 8 --max-batch 8 --format jpeg

timeout 3600 python tools/bench_eval_protocol.py --precision fast

timeout 3600 python tools/profile_attribution.py --tiers fast,draft --out /tmp/PROFILE_raw_r5.json

for cc in 32 64; do
  timeout 1800 env BENCH_PRECISION=fast BENCH_COL_CHUNK=$cc python bench.py
done
for cc in 32 64; do
  timeout 1800 env BENCH_PRECISION=draft BENCH_COL_CHUNK=$cc python bench.py
done

echo "=== r5c queue done ==="
