#!/bin/bash
# Round-end chip sequence — run AFTER the production train exits
# (TRAIN_DURATION deadline). Order = judge-value priority; each step
# logs separately so a straggler can be cut without losing the rest.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# 1. headline bench (also warms the compile cache for the driver's run)
timeout 1500 python3 bench.py 2>&1 | tee logs/bench_r3.log

# 2. decisive LBR sweep over the round-3 snapshots on the chip
timeout 2400 python3 scripts/lbr_watch.py --tpu --hands 16384 \
    --rollouts 32 --min-epoch-gap 1200 --idle-exit-s 30 \
    --out docs/lbr_curve_r3_chip.jsonl 2>&1 | tee logs/lbr_chip.log

# 2b. round-1 flagship under the IDENTICAL estimator (fair promote bar)
timeout 2400 python3 -m robopoker_tpu.cli lbr --workdir artifacts \
    --abstraction artifacts/abstraction --hands 16384 --batch 256 \
    --rollouts 32 --mode fc 2>&1 | tee logs/lbr_r1_chip.log

# 3. utilization / roofline at the production config
timeout 1200 python3 scripts/utilization.py --tpu 2>&1 | tee logs/util_r3.log

# 4. fused-settle micro-bench (wire-on-win decision)
timeout 900 python3 scripts/bench_settle.py 2>&1 | tee logs/settle_r3.log

# 5. real-time re-solve latency
timeout 1200 python3 scripts/resolve_latency.py --tpu --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full 2>&1 | tee logs/resolve_r3.log
