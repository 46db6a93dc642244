#!/bin/bash
# Round-4 slate 2: rerun of the two steps the first slate lost to the
# (now fixed) Mosaic i1-bitcast and resolver HLO-constant traps.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

timeout 1500 python3 scripts/bench_settle.py 2>&1 | tee logs/settle_r4b.log

timeout 1500 python3 scripts/resolve_latency.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/resolve_r4b.log

echo "SLATE2 DONE"
