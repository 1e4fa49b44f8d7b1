"""Capture a real device profile of the driver-bench step (VERDICT r3
item 6) and print the aggregated stage table.

Wraps the production 4-W-slice bench workload (bench.run_step_bench) in
``jax.profiler.trace`` and aggregates the captured ``.xplane.pb`` with
``profiling.parse_device_profile`` — the TPU-native analogue of the
reference's --write-device-profile GPU-event table
(reference profiling.py:133-149, scripts/imager.py:89-92).

Usage: python scripts/device_profile_bench.py [logdir] [top_n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def main() -> None:
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ktpu_xprof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    from bench import run_step_bench
    from katsdpimager_tpu import profiling
    from katsdpimager_tpu.parallel.multichannel import MultiChannelConfig

    on_accel = jax.devices()[0].platform != "cpu"
    if on_accel:
        cfg = MultiChannelConfig(
            pixels=4096, num_pols=1, kernel_width=60, oversample=8,
            w_planes=32, w_slices=4, chunks_per_slice=4096, chunk_size=256,
            rv=64, ru=64, minor_cycles=0, weight_type="natural")
        num_channels, vis_per_slice = 8, 1 << 19
    else:
        cfg = MultiChannelConfig(
            pixels=512, num_pols=1, kernel_width=16, oversample=8,
            w_planes=8, w_slices=2, chunks_per_slice=256, chunk_size=128,
            rv=32, ru=32, minor_cycles=0)
        num_channels, vis_per_slice = 2, None

    # First call compiles outside the trace; the traced run is steady
    # state (run_step_bench warms up before timing).
    with profiling.device_trace(logdir):
        result = run_step_bench(cfg, num_channels, vis_per_slice, iters=2)
    print(result, flush=True)

    totals = profiling.parse_device_profile(logdir)
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_n]
    total = sum(totals.values())
    print(f"\ncaptured {len(totals)} ops, total device time "
          f"{total * 1e3:.1f} ms across the traced window", flush=True)
    print(f"{'line':24s} {'op':56s} {'ms':>9s} {'share':>6s}")
    for (line, op), t in rows:
        print(f"{line[:24]:24s} {op[:56]:56s} {t * 1e3:9.2f} "
              f"{t / total * 100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
