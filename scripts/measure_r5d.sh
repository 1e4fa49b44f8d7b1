#!/bin/bash
# Round-5 sweep D: IQUV at the full BASELINE design point.  Sweep C's
# IQUV run thinned 64x (chunks_per_slice=10240 fragmented the 2^21
# vis/slice cloud; make_example_batch halves until it fits).  Retry at
# the P=1 capacity (16384); fall back one step if HBM rejects it.
cd /root/repo
LOG=${LOG:-/tmp/measure_r5d.log}
run() {
  echo "=== $* ($(date +%H:%M:%S))" >> "$LOG"
  timeout "$1" "${@:2}" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date +%H:%M:%S))" >> "$LOG"
}
run 3000 env KTPU_CUBE_NC=16384 python benchmarks/cube_bench.py 8192 21 4
run 3000 env KTPU_CUBE_NC=12288 python benchmarks/cube_bench.py 8192 21 4
# Chunk-capacity (Mc) sweep on the fused gridder: the band dots are
# per-chunk pipeline bound (sweep A kstack writeup); fewer/fuller chunks
# is the remaining named lever.
run 1800 env KTPU_BENCH_MC=512 python benchmarks/pallas_tpu.py \
  1048576,4194304 4096 60 32 pallas
run 1800 env KTPU_BENCH_MC=1024 python benchmarks/pallas_tpu.py \
  4194304 4096 60 32 pallas
echo "ALL DONE $(date +%H:%M:%S)" >> "$LOG"
