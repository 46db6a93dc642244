#!/bin/bash
# Trimmed round-end chip sequence for a ~65-min window (round 3 final
# session). Run AFTER the train's graceful SIGTERM exit. Ordered by
# judge value; every step has a hard timeout so stragglers can't eat
# the window. Full version: round_end.sh.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# 1. decisive LBR sweep over round-3 snapshots on the chip
# (32,768 hands -> stderr ~ +/-150 mbb/hand, the VERDICT #4 "done" bar)
timeout 1500 python3 scripts/lbr_watch.py --tpu --hands 32768 \
    --rollouts 32 --min-epoch-gap 1200 --idle-exit-s 30 \
    --out docs/lbr_curve_r3_chip.jsonl 2>&1 | tee logs/lbr_chip.log

# 1b. round-1 flagship under the IDENTICAL estimator (fair promote bar)
timeout 1200 python3 -m robopoker_tpu.cli lbr --workdir artifacts \
    --abstraction artifacts/abstraction --hands 32768 --batch 256 \
    --rollouts 32 --mode fc 2>&1 | tee logs/lbr_r1_chip.log

# 2. litmus on the final round-3 blueprint (promote decision input)
timeout 900 python3 -m robopoker_tpu.cli litmus --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/litmus_r3.log

# 3. headline bench (also warms the compile cache for the driver's run)
timeout 1500 python3 bench.py 2>&1 | tee logs/bench_r3.log

# 4. utilization / roofline at the production config
timeout 700 python3 scripts/utilization.py --tpu 2>&1 | tee logs/util_r3.log

# 5. fused-settle micro-bench (wire-on-win decision)
timeout 500 python3 scripts/bench_settle.py 2>&1 | tee logs/settle_r3.log

# 6. real-time re-solve latency
timeout 700 python3 scripts/resolve_latency.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/resolve_r3.log

# 7. AIVAT self-play variance reduction on the trained blueprint
timeout 500 python3 scripts/aivat_bench.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/aivat_r3.log
