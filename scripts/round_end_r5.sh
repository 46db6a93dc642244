#!/bin/bash
# Round-5 end slate: promote-bar inputs under IDENTICAL estimator
# conditions (16,384-hand CPU fc-LBR, CPU litmus, CPU arena), then the
# official bench on the freed chip. Run AFTER the production train
# exits (its dense snapshot committed).
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

# 1. candidate litmus with the why-report (CPU)
timeout 2400 python3 scripts/cpu_cli.py litmus --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full --why \
    2>&1 | tee logs/litmus_r5.log

# 2. candidate final fc-LBR point (CPU, identical estimator to the bar)
timeout 9000 python3 scripts/lbr_watch.py --workdir artifacts/r2 \
    --abstraction artifacts/abstraction_full --hands 16384 \
    --min-epoch-gap 200 --idle-exit-s 60 \
    --out docs/lbr_curve_r5.jsonl 2>&1 | tee logs/lbr_r5_final.log

# 3. arena: candidate vs the r1 flagship (CPU, AIVAT-reduced)
timeout 3600 python3 scripts/arena_match.py \
    --a artifacts/r2 --abstraction-a artifacts/abstraction_full \
    --b artifacts    --abstraction-b artifacts/abstraction \
    --hands 16384 2>&1 | tee logs/arena_r5_vs_r1.log

# 4. decision
python3 scripts/promote_decision.py 2>&1 | tee logs/promote_r5.log

# 5. official bench + multichip dryrun on the freed chip
timeout 2400 python3 bench.py 2>&1 | tee logs/bench_r5.log
XLA_FLAGS=--xla_force_host_platform_device_count=8 timeout 900 \
    python3 -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)" \
    2>&1 | tee logs/dryrun_r5.log

echo "ROUND-END SLATE DONE"
