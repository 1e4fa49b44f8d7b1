#!/bin/bash
# Round-5 measurement sweep, priority-ordered for brief tunnel windows
# (VERDICT r4 items 1-5).  Runs each harness under timeout; appends to
# /tmp/measure_r5.log so partial windows still leave a record.
cd /root/repo
LOG=${LOG:-/tmp/measure_r5.log}
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
# 1. the driver headline (production 4-W-slice shape, hardened worker)
run 2700 python bench.py
# 2. band-dot A/B: Gauss 3-dot (default) vs contraction-stacked kstack
run 1800 python benchmarks/pallas_tpu.py 1048576,4194304 4096 60 32 pallas
run 1800 env KTPU_PALLAS_BAND=kstack python benchmarks/pallas_tpu.py \
  1048576,4194304 4096 60 32 pallas
# 2b. fused Pallas FFT A/B (grid_to_image / image_to_grid) at 4k and 8k
run 1800 python benchmarks/slicecost_tpu.py g2i_xla g2i_pallas i2g_xla \
  i2g_pallas
run 1800 python benchmarks/slicecost_tpu.py --pixels=8192 g2i_xla \
  g2i_pallas i2g_xla i2g_pallas
# 2c. IQUV band polstack A/B (P-fold fewer MXU launches)
run 1800 env KTPU_BENCH_POLS=4 python benchmarks/pallas_tpu.py \
  1048576 4096 60 32 pallas
run 1800 env KTPU_BENCH_POLS=4 KTPU_PALLAS_POLSTACK=0 \
  python benchmarks/pallas_tpu.py 1048576 4096 60 32 pallas
# 3. 8k cube device point (target <= 1.8 s/channel)
run 2400 python benchmarks/cube_bench.py 8192 21 1
# 4. IQUV row at the BASELINE design point
run 2400 python benchmarks/cube_bench.py 8192 21 4
# 5. end-to-end cube wall-clock (dataset -> FITS)
run 3600 python benchmarks/cube_e2e.py
# 5b. restore-convolution r2c A/B at 8k
run 1200 python benchmarks/beam_tpu.py 8192 1
# 6. post-change device profile
run 2400 python scripts/device_profile_bench.py
# 7. production-step A/Bs: fused FFT on the headline shape; step decomp
run 2700 env KTPU_FFT=pallas python bench.py
run 1800 python benchmarks/stepdecomp_tpu.py
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
