#!/bin/bash
# Round-5 on-chip qualification queue (serialized: the TPU is exclusive).
#  1. column-cull kernel compile/parity check (all tiers + draft composition)
#  2. parity matrix (10 fixtures x tiers) under the column cull
#  3. relight throughput per tier, real face mask + random-mask basis
#  4. train-step bench per tier (batch 3, face mask)
#  5. serving storm: PNG vs JPEG response formats
#  6. device-resident trainer leak probe (RSS must be flat)
set -x
cd /root/repo

timeout 3600 python /tmp/colcull_chip_check.py

timeout 3600 python tools/parity_matrix.py --out docs/PARITY_matrix.json

for tier in fast draft high strict; do
  timeout 3600 env BENCH_PRECISION=$tier python bench.py
done
for tier in fast draft; do
  timeout 3600 env BENCH_PRECISION=$tier BENCH_MASK=random python bench.py
done

for tier in fast high strict; do
  timeout 3600 env GCFR_TIER=$tier GCFR_MASK=face python tools/bench_train.py
done

timeout 3600 python tools/bench_serve.py --precision high --requests 64 \
  --concurrency 8 --max-batch 8
timeout 3600 python tools/bench_serve.py --precision high --requests 64 \
  --concurrency 8 --max-batch 8 --format jpeg
timeout 3600 python tools/bench_serve.py --precision high --tiers high,draft \
  --requests 64 --concurrency 8 --max-batch 8 --format jpeg

timeout 2400 python tools/leak_probe.py --trainer --residency auto --epochs 3

echo "=== r5 queue done ==="
