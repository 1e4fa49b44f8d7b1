#!/bin/bash
# Round-5 sweep E: the f32 parts pipeline on chip (bench + 8k cube) and
# the IQUV design-point retry (sweep D's 16384 OOM'd; 12288 hit the
# combine occx block-shape bug, fixed in 88bd324).
cd /root/repo
LOG=${LOG:-/tmp/measure_r5e.log}
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
run 2700 python bench.py
run 2400 python benchmarks/cube_bench.py 8192 21 1
run 3000 env KTPU_CUBE_NC=12288 python benchmarks/cube_bench.py 8192 21 4
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
