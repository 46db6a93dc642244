#!/bin/bash
# Round-5 second chip window: NEW resolver (chunked dispatches, fused
# harvest, budget reserve) — latency table + adapt_full value arm.
set -x
cd /root/repo
timeout 1080 python3 scripts/resolve_latency.py --tpu \
  --workdir artifacts/r2 --abstraction artifacts/abstraction_full \
  --budget-s 5 > logs/r5_resolve_latency2.log 2>&1
echo "latency2 rc=$?"
timeout 1800 python3 scripts/resolve_value.py --tpu \
  --workdir artifacts/r4 --abstraction artifacts/abstraction_full \
  --budget-ms 5000 --arms blueprint,adapt_full \
  --out docs/resolve_value_full.md > logs/r5_resolve_value2.log 2>&1
echo "value2 rc=$?"
echo "WINDOW2 DONE"
timeout 700 python3 scripts/search_handrate.py --tpu \
  --workdir artifacts/r2 --abstraction artifacts/abstraction_full \
  --hands 24 > logs/r5_handrate.log 2>&1
echo "handrate rc=$?"
timeout 700 python3 scripts/search_handrate.py --tpu \
  --workdir artifacts/r2 --abstraction artifacts/abstraction_full \
  --hands 12 --sessions 4 --out docs/search_handrate_x4.md \
  > logs/r5_handrate4.log 2>&1
echo "handrate4 rc=$?"
timeout 1200 python3 scripts/pool_rate.py --tpu \
  --workdir artifacts/r2 --abstraction artifacts/abstraction_full \
  --sessions 4 > logs/r5_poolrate.log 2>&1
echo "poolrate rc=$?"
timeout 1800 python3 scripts/lbr_watch.py --tpu --workdir artifacts/r2 \
  --abstraction artifacts/abstraction_full --hands 16384 \
  --min-epoch-gap 200 --idle-exit-s 30 \
  --out artifacts/r2/lbr_curve_chip.jsonl > logs/r5_lbr_final_chip.log 2>&1
echo "final chip lbr rc=$?"
