#!/bin/bash
# Round-5 sweep B: re-run the harnesses that the VMEM cap and degrid
# alignment fixes unblocked, priority-ordered for brief tunnel windows.
cd /root/repo
LOG=${LOG:-/tmp/measure_r5b.log}
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
# 1. fused Pallas FFT A/B at 4k and 8k (VMEM cap fixed)
run 1800 python benchmarks/slicecost_tpu.py g2i_xla g2i_pallas i2g_xla \
  i2g_pallas
run 1800 python benchmarks/slicecost_tpu.py --pixels=8192 g2i_xla \
  g2i_pallas i2g_xla i2g_pallas
# 2. 8k cube device point (degrid alignment fixed; target <= 1.8 s/chan)
run 2400 python benchmarks/cube_bench.py 8192 21 1
# 3. IQUV row at the BASELINE design point
run 3000 python benchmarks/cube_bench.py 8192 21 4
# 4. fused degrid vs tapdict A/B (first on-chip degrid kernel numbers)
run 1800 python benchmarks/pallas_tpu.py --degrid 1048576,4194304 4096 60 32 \
  tapdict pallas
# 5. end-to-end cube wall-clock (dataset -> FITS, w geometry fixed)
run 3600 python benchmarks/cube_e2e.py
# 6. fused FFT on the production headline shape
run 2700 env KTPU_FFT=pallas python bench.py
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
