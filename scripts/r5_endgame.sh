#!/bin/bash
# Round-5 endgame: wait for the supervisor (by exact PID) to exit, then
# run the second chip window (new-resolver measurements) and the
# round-end slate. CPU slate items run concurrently with chip items.
SUP_PID=$1
cd /root/repo
echo "endgame: waiting on supervisor pid $SUP_PID"
while kill -0 "$SUP_PID" 2>/dev/null; do sleep 30; done
echo "endgame: supervisor exited at $(date -u)"
# chip: the official bench FIRST (driver-scored; warm cache, quiet chip),
# then the new-resolver window
( timeout 2400 python3 bench.py 2>&1 | tee logs/bench_r5.log
  bash scripts/r5_chip_window2.sh > logs/r5_window2.log 2>&1 ) &
CHIP=$!
# cpu: litmus + final LBR point + arena (niced below the chip jobs' host threads)
nice -n 10 bash -c '
  timeout 2400 python3 scripts/cpu_cli.py litmus --workdir artifacts/r2 \
      --abstraction artifacts/abstraction_full --why 2>&1 | tee logs/litmus_r5.log
  timeout 9000 python3 scripts/lbr_watch.py --workdir artifacts/r2 \
      --abstraction artifacts/abstraction_full --hands 16384 \
      --min-epoch-gap 200 --idle-exit-s 60 \
      --out docs/lbr_curve_r5.jsonl 2>&1 | tee logs/lbr_r5_final.log
  timeout 3600 python3 scripts/arena_match.py \
      --a artifacts/r2 --abstraction-a artifacts/abstraction_full \
      --b artifacts    --abstraction-b artifacts/abstraction \
      --hands 16384 2>&1 | tee logs/arena_r5_vs_r1.log
' &
CPU=$!
wait $CHIP
echo "endgame: chip window2 done $(date -u)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS= timeout 900 \
    python3 -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)" \
    2>&1 | tee logs/dryrun_r5.log
wait $CPU
python3 scripts/promote_decision.py 2>&1 | tee logs/promote_r5.log
echo "ENDGAME DONE $(date -u)"
