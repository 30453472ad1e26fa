#!/bin/bash
# Round-5b: requalify against the FINAL dual-path column-cull kernel
# (dense slabs reuse the pre-chunking full-width schedule; sparse slabs
# run per-chunk loops). Serialized: the TPU is exclusive.
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

timeout 2400 python tools/leak_probe.py --trainer --residency auto --epochs 3

echo "=== r5b queue done ==="
