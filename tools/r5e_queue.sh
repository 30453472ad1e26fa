#!/bin/bash
# Round-5e on-chip queue (run AFTER r5c frees the chip):
#  1. Finish the column-chunk-width study: fast-tier chunk 32 measured
#     53.85 img/s vs 50.31 at the shipping 64 (+7.0%); draft 351.2 vs
#     361.0 (-2.7%). Qualify 32 on the remaining full-res tiers, the
#     random-mask zero-cost check, and the batch-3 train step before
#     flipping the per-tier default.
#  2. r5d pipelined-serving A/B storms (see tools/r5d_queue.sh header).
# Serialized: the TPU is exclusive.
set -x
cd /root/repo

timeout 1800 env BENCH_PRECISION=strict BENCH_COL_CHUNK=32 python bench.py
timeout 1800 env BENCH_PRECISION=high BENCH_COL_CHUNK=32 python bench.py
timeout 1800 env BENCH_MASK=random BENCH_PRECISION=fast BENCH_COL_CHUNK=32 python bench.py
timeout 1800 env GCFR_TIER=fast GCFR_MASK=face GCFR_COL_CHUNK=32 python tools/bench_train.py 3
timeout 1800 env GCFR_TIER=fast GCFR_MASK=face GCFR_COL_CHUNK=64 python tools/bench_train.py 3

bash tools/r5d_queue.sh

echo "=== r5e queue done ==="
