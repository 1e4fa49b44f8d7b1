#!/bin/bash
# Round-4 hour-one measurement sweep (VERDICT item 1). Runs each decision
# harness sequentially under timeout; logs to /tmp/measure_r4.log.
cd /root/repo
LOG=/tmp/measure_r4.log
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> $LOG
  timeout "$1" "${@:2}" >> $LOG 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> $LOG
}
run 2400 python benchmarks/slicecost_tpu.py
run 2400 python benchmarks/slicecost_tpu.py --pixels=8192
run 2400 python benchmarks/stepdecomp_tpu.py
run 2400 python benchmarks/tapdict_tpu.py
echo "ALL DONE $(date +%H:%M:%S)" >> $LOG
