"""Benchmark harness: gridding + FFT throughput per chip.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline", ...}``.

The metric is compressed visibilities gridded per second per chip through
the full dirty-image step — MXU chunked convolutional gridding with W
kernels + FFT + W-correction (see ops/mxu_gridder.py), i.e. the BASELINE's
"Mvis gridded/sec/chip".  The reference publishes no absolute number
(BASELINE.md); it measures the same workload as GGAPS = N_vis *
kernel_width^2 * n_pols / t (tests/imager_bench.py:166-208).
``vs_baseline`` is measured GGAPS relative to 1.0 GGAPS, a representative
figure for the reference's CUDA gridder on a datacentre GPU of its era.

Workload (round 4: the PRODUCTION SHAPE, per VERDICT r3 item 2): an
8-channel batch (the production pipelines always dispatch multi-channel
batches — the reference's default channel-batch is 16,
frontend.py:356-367) of ~2M compressed visibilities per channel
(MeerKAT-64 yields 2016 baselines x 3600 dumps ≈ 7.3M raw vis/channel
before compression; the BASELINE 8k point carries 2.1M compressed) onto
4k-pixel single-pol grids, kernel width 60, oversample 8, 32 W planes,
**4 W-stacking slices** (the reference's w-slice search returns ~4 for
real max-w, parameters.py:161-183 — a single-slice workload cannot see
the per-slice fixed cost), clustered UV, natural imaging weights (the
CLI default; uniform/robust add a density-grid stage).  Channels run
sequentially inside ONE dispatch, so the ~30 ms tunnel dispatch+fetch
floor is amortized the way production waves amortize it.  The
single-slice point remains a suite entry (benchmarks/bench_suite.py).
Falls back to a smaller CPU-sized workload when no accelerator is
attached.

Backend notes: the experimental axon TPU tunnel neither transfers complex64
arrays nor reliably honours ``block_until_ready``, so complex inputs cross
the boundary as (..., 2) float32 pairs combined in-jit with
``lax.complex``, and timing is synchronised by fetching an f32 scalar
checksum of the result.
"""

import json
import os
import time

import numpy as np

import jax

# Compilation through the experimental TPU tunnel is slow (minutes); use a
# persistent cache next to this file so repeat runs start hot.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from jax import lax


def _accelerator_usable() -> bool:
    """Probe the accelerator with a tiny op IN A SUBPROCESS: the axon
    tunnel can wedge (ops hang rather than fail), and a hung probe in
    this process would take the whole benchmark down with it.

    The tunnel also flaps: a transient outage at benchmark time would
    otherwise silently record the tiny CPU-fallback workload as the
    headline number, so retry the probe a few times before giving up
    (bounded at ~6 minutes total)."""
    import subprocess
    import sys
    import time as _time

    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.ones((8, 8)))),"
            " jax.devices()[0].platform)")
    for attempt in range(3):
        if attempt:
            _time.sleep(30)
        try:
            # Cold tunnel device-enumeration alone can take minutes;
            # a tight probe timeout here silently records the CPU
            # fallback as the headline (observed round 4).
            out = subprocess.run([sys.executable, "-c", code], timeout=240,
                                 capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            continue
        if out.returncode == 0:
            return "cpu" not in out.stdout.split()[-1:]
    return False


def _pair(x: np.ndarray):
    return jnp.asarray(np.stack([x.real, x.imag], axis=-1).astype(np.float32))


def run_step_bench(cfg, num_channels: int, vis_per_slice: int | None,
                   iters: int = 3) -> dict:
    """Time the multi-channel dirty-image step; returns the result dict.

    Shared by the driver headline (production 4-W-slice shape) and the
    suite's single-slice twin (benchmarks/bench_suite.py)."""
    from katsdpimager_tpu.parallel.multichannel import (
        make_example_batch, single_channel_step,
    )

    batch = make_example_batch(cfg, num_channels,
                               vis_per_slice=vis_per_slice)
    num_vis = int(np.asarray(batch.valid).sum())
    base = single_channel_step(cfg)

    from katsdpimager_tpu import xfer

    kern_p = _pair(xfer.fetch_complex(batch.kernel))
    vis_p = _pair(xfer.fetch_complex(batch.vis))
    rest = [jnp.asarray(np.asarray(x)) for x in
            (batch.taper1d, batch.pixel_size, batch.mid_w, batch.uv,
             batch.sub_uv, batch.w_plane, batch.anchor, batch.valid,
             batch.weights)]

    # All batch arrays are explicit jit ARGUMENTS (a closure would embed
    # them as constants in the compile payload — hundreds of MB through
    # the remote-compile tunnel).
    @jax.jit
    def step(kp, vp, *rest_args):
        kernel = lax.complex(kp[..., 0], kp[..., 1])
        vis = lax.complex(vp[..., 0], vp[..., 1])

        def one(args):
            kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
            residual, _model = base(kern_c, t, ps, mw, uv, sub, wpl, anc,
                                    val, wts, vis_c)
            # f32 checksum: fetching it is the only reliable device sync.
            return jnp.sum(jnp.abs(residual[:, ::64, ::64]))

        sums = lax.map(one, (kernel, vis) + tuple(rest_args))
        return jnp.sum(sums)

    # Warmup / compile
    float(step(kern_p, vis_p, *rest))

    start = time.perf_counter()
    vals = [step(kern_p, vis_p, *rest) for _ in range(iters)]
    for v in vals:
        float(v)
    elapsed = (time.perf_counter() - start) / iters

    mvis_per_s = num_vis / elapsed / 1e6
    ggaps = num_vis * cfg.kernel_width ** 2 * cfg.num_pols / elapsed / 1e9

    return {
        "metric": "Mvis_gridded_per_sec_per_chip",
        "value": round(mvis_per_s, 3),
        "unit": "Mvis/s",
        "vs_baseline": round(ggaps / 1.0, 3),
        "ggaps": round(ggaps, 3),
        "elapsed_s": round(elapsed, 4),
        "num_vis": num_vis,
        "num_channels": num_channels,
        "pixels": cfg.pixels,
        "kernel_width": cfg.kernel_width,
        "w_slices": cfg.w_slices,
        "device": str(jax.devices()[0]),
    }


def main():
    from katsdpimager_tpu.parallel.multichannel import MultiChannelConfig

    # When jax_platforms is unset, don't assume CPU: the subprocess probe
    # reports the default backend's platform, so a directly attached
    # accelerator is detected even without JAX_PLATFORMS in the env.
    plat = (jax.config.jax_platforms or "").split(",")[0]
    on_accel = plat != "cpu" and _accelerator_usable()
    if not on_accel:
        # fall back BEFORE any backend initializes in this process
        jax.config.update("jax_platforms", "cpu")
    if on_accel:
        # chunks_per_slice must hold the fragmented 512k-vis slice
        # (~5k occupied chunks at this UV spread); the round-4 value of
        # 4096 silently thinned the workload to 262k vis/slice via
        # make_example_batch's fragmentation fallback.
        cfg = MultiChannelConfig(
            pixels=4096, num_pols=1, kernel_width=60, oversample=8,
            w_planes=32, w_slices=4, chunks_per_slice=8192, chunk_size=256,
            rv=64, ru=64, minor_cycles=0, weight_type="natural")
        num_channels = 8
        vis_per_slice = 1 << 19
    else:
        cfg = MultiChannelConfig(
            pixels=512, num_pols=1, kernel_width=16, oversample=8,
            w_planes=8, w_slices=2, chunks_per_slice=256, chunk_size=128,
            rv=32, ru=32, minor_cycles=0)
        num_channels = 2
        vis_per_slice = None
    print(json.dumps(run_step_bench(cfg, num_channels, vis_per_slice)))


if __name__ == "__main__":
    main()
