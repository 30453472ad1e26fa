#!/bin/bash
# Round-4 session D on-chip queue (serialized: the TPU is exclusive).
# 1-2. draft scale-4 low-res t-stride 2 and 4: parity + throughput
# 3-5. serve storm requalify under the shipping scale-4 draft tier
set -x
cd /root/repo

timeout 3000 python tools/qualify_draft4.py --t-stride 2 \
  --out /tmp/draft4_ts2_chip.json
echo "=== ts2 EXIT=$?"

timeout 3000 python tools/qualify_draft4.py --t-stride 4 \
  --out /tmp/draft4_ts4_chip.json
echo "=== ts4 EXIT=$?"

timeout 3000 python tools/bench_serve.py --precision high \
  > /tmp/serve_high.json
echo "=== serve high EXIT=$?"

timeout 3000 python tools/bench_serve.py --precision high --tiers high,draft \
  > /tmp/serve_high_draft.json
echo "=== serve high+draft EXIT=$?"

timeout 3600 python tools/bench_serve.py --precision high \
  --tiers strict,high,fast,draft > /tmp/serve_mix.json
echo "=== serve mix EXIT=$?"
