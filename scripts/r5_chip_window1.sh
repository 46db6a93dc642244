#!/bin/bash
# Round-5 first chip window: the two deferred cached measurements.
set -x
cd /root/repo
timeout 1800 python3 scripts/resolve_latency.py --tpu \
  --workdir artifacts/r2 --abstraction artifacts/abstraction_full \
  --budget-s 5 > logs/r5_resolve_latency.log 2>&1
echo "latency rc=$?"
timeout 2700 python3 scripts/resolve_value.py --tpu \
  --workdir artifacts/r4 --abstraction artifacts/abstraction_full \
  --budget-ms 5000 --arms blueprint,adapt_full \
  --out docs/resolve_value_full.md > logs/r5_resolve_value.log 2>&1
echo "value rc=$?"
