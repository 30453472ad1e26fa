#!/bin/bash
# Round-5f on-chip queue (run AFTER r5e frees the chip): requalify parity
# against the shipping chunk-32 tiers (strict/high/fast now march at
# (8 x 32) block granularity; draft unchanged at 64). Exactness is
# structural -- the chunk width only changes WHICH off-face blocks are
# culled, invisible on every reference surface -- but the parity matrix is
# the committed receipt for every kernel-config change.
set -x
cd /root/repo

timeout 5400 python tools/parity_matrix.py --out docs/PARITY_matrix.json

echo "=== r5f queue done ==="
