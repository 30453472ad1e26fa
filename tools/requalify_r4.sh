#!/bin/bash
# Round-4 on-chip requalification after mask-aware march culling landed in
# every precision tier (RenderConfig.shadow_mask_cull). Serialized: the TPU
# is exclusive. Writes JSON lines to the log; artifacts assembled afterwards.
set -x
cd /root/repo

echo "=== parity matrix (tiers now cull; batch-1 fixtures) ==="
timeout 3600 python tools/parity_matrix.py --out docs/PARITY_matrix.json

echo "=== relight throughput per tier, REAL face mask (bench.py default) ==="
for tier in fast draft high strict; do
  echo "--- tier=$tier mask=face"
  timeout 3600 env BENCH_PRECISION=$tier python bench.py
done

echo "=== legacy random mask (cull never fires; cross-round basis) ==="
for tier in fast draft; do
  echo "--- tier=$tier mask=random"
  timeout 3600 env BENCH_PRECISION=$tier BENCH_MASK=random python bench.py
done

echo "=== train step batch 3, tiers via apply_precision_tier, face mask ==="
for tier in fast high strict; do
  echo "--- train tier=$tier mask=face"
  timeout 3600 env GCFR_TIER=$tier GCFR_MASK=face python tools/bench_train.py
done

echo "=== serving load benchmark (mixed-tier storm) ==="
timeout 3600 python tools/bench_serve.py --precision high --requests 64 \
  --concurrency 8 --max-batch 8
timeout 3600 python tools/bench_serve.py --precision high --tiers high,draft \
  --requests 64 --concurrency 8 --max-batch 8

echo "=== done ==="
