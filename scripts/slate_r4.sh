#!/bin/bash
# Round-4 first-session chip measurement slate (VERDICT r3 next #3/#4):
# the non-LBR chip numbers that slipped in round 3. Run on an idle chip
# BEFORE the production train claims it. Each step hard-timeouted.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# 1. fused-settle micro-bench (wire-on-win decision; ADVICE r3 #1:
#    first on-chip compile of the post-fix Pallas specs)
timeout 900 python3 scripts/bench_settle.py 2>&1 | tee logs/settle_r4.log

# 2. real-time re-solve latency vs the reference's 5 s budget
timeout 1200 python3 scripts/resolve_latency.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/resolve_r4.log

# 3. AIVAT self-play variance reduction at scale
timeout 900 python3 scripts/aivat_bench.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/aivat_r4.log

# 4. utilization / roofline (memcpy-calibrated ceiling, fixed labels)
timeout 1200 python3 scripts/utilization.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/util_r4.log

echo "SLATE DONE"
