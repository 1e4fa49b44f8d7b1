#!/bin/bash
# Round-5 sweep C: re-run everything the sweep-B degrid compile failure
# blocked (VERDICT r4 items 2, 4, 5), now that the fused degrid's window
# DMA is 128-lane aligned and the fused Pallas FFT is the TPU default.
cd /root/repo
LOG=${LOG:-/tmp/measure_r5c.log}
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
# 1. degrid A/B (never yet measured on chip: argparse bug in sweep B)
run 1800 python benchmarks/pallas_tpu.py --degrid 1048576,4194304 \
  4096 60 32 tapdict pallas
# 2. 8k cube device point (target <= 1.8 s/channel)
run 2400 python benchmarks/cube_bench.py 8192 21 1
# 3. IQUV row at the BASELINE design point
run 3000 python benchmarks/cube_bench.py 8192 21 4
# 4. end-to-end cube wall-clock (dataset -> FITS)
run 3600 python benchmarks/cube_e2e.py
# 5. the driver headline with the new defaults (fused FFT)
run 2700 python bench.py
# 6. post-change device profile (kernel share target >= 60%)
run 2400 python scripts/device_profile_bench.py
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
