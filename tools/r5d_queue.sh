#!/bin/bash
# Round-5d on-chip queue (run AFTER r5c frees the chip): qualify the
# pipelined micro-batch worker (serve.py MicroBatcher pipeline=True).
#  - c8 jpeg storm: regression vs the r5c serialized runs (at concurrency
#    == max_batch the pipeline never engages, numbers should match).
#  - c16 storms, pipeline on vs --no-pipeline: the A/B where overlap can
#    fire (two batches outstanding; upload/fetch rides under compute).
#  - draft tier c16: smallest device time per batch, so the tunnel share
#    is largest and pipelining has the most to hide.
# Serialized: the TPU is exclusive.
set -x
cd /root/repo

timeout 1800 python tools/bench_serve.py --precision high --requests 64 --concurrency 8 --max-batch 8 --format jpeg
timeout 1800 python tools/bench_serve.py --precision high --requests 128 --concurrency 16 --max-batch 8 --format jpeg
timeout 1800 python tools/bench_serve.py --precision high --requests 128 --concurrency 16 --max-batch 8 --format jpeg --no-pipeline
timeout 1800 python tools/bench_serve.py --precision high --tiers draft --requests 128 --concurrency 16 --max-batch 8 --format jpeg
timeout 1800 python tools/bench_serve.py --precision high --tiers draft --requests 128 --concurrency 16 --max-batch 8 --format jpeg --no-pipeline

echo "=== r5d queue done ==="
