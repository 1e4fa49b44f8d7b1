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


def _probe_accelerator() -> dict:
    """Probe the accelerator IN A SUBPROCESS and return a diagnostics dict
    ``{"usable": bool, "attempts": [...]}``.

    The axon tunnel can wedge (ops hang rather than fail), so the probe
    must be a subprocess — a hung probe in this process would take the
    whole benchmark down with it.  The tunnel also flaps: a transient
    outage at benchmark time would otherwise silently record the tiny
    CPU-fallback workload as the headline number (this HAPPENED in round
    4: BENCH_r04.json recorded TFRT_CPU_0 at 0.016 Mvis/s), so the probe
    is one LONG-budget warm-up attempt (cold device enumeration alone can
    take minutes) that also primes the persistent compilation cache,
    plus one retry.  Every attempt's outcome is recorded and emitted in
    the output JSON so a fallback can never be misread as a regression.

    Budget knob: KTPU_BENCH_PROBE_TIMEOUT (seconds per attempt, default
    900 — a cold tunnel's first tiny op measured 564 s in round 5, so
    600 was one hiccup away from a false fallback).
    KTPU_BENCH_FORCE_CPU=1 skips the probe entirely."""
    import subprocess
    import sys
    import time as _time

    if os.environ.get("KTPU_BENCH_FORCE_CPU"):
        return {"usable": False, "attempts": [],
                "note": "KTPU_BENCH_FORCE_CPU set"}

    # Warm-up probe: enumerate devices, run a tiny op, then compile one
    # small jitted function with the SAME persistent cache dir as the
    # benchmark, so a cold tunnel's first-compile latency is paid here
    # (inside the probe budget) rather than mid-benchmark.
    code = f"""
import time, jax
jax.config.update("jax_compilation_cache_dir", {_CACHE!r})
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
t0 = time.time(); devs = jax.devices()
print("enum_s", round(time.time() - t0, 1), flush=True)
t0 = time.time(); v = float(jnp.sum(jnp.ones((8, 8))))
print("op_s", round(time.time() - t0, 1), v, flush=True)
t0 = time.time()
f = jax.jit(lambda x: jnp.fft.fft2(jnp.einsum('ij,jk->ik', x, x) + 0j))
x = jnp.ones((256, 256), jnp.float32)
s = float(jnp.abs(f(x)).sum())
print("warm_s", round(time.time() - t0, 1), flush=True)
print("platform", devs[0].platform, flush=True)
"""
    timeout_s = int(os.environ.get("KTPU_BENCH_PROBE_TIMEOUT", "900"))
    attempts = []
    for attempt in range(2):
        if attempt:
            _time.sleep(30)
        rec = {"attempt": attempt, "timeout_s": timeout_s}
        t0 = _time.time()
        try:
            out = subprocess.run([sys.executable, "-c", code],
                                 timeout=timeout_s,
                                 capture_output=True, text=True)
        except subprocess.TimeoutExpired as exc:
            rec.update(duration_s=round(_time.time() - t0, 1),
                       outcome="timeout",
                       stdout_tail=((exc.stdout or b"").decode(
                           "utf-8", "replace"))[-300:])
            attempts.append(rec)
            print(f"bench probe attempt {attempt}: TIMEOUT after "
                  f"{timeout_s}s", file=sys.stderr, flush=True)
            continue
        rec.update(duration_s=round(_time.time() - t0, 1),
                   outcome="rc=%d" % out.returncode,
                   stdout_tail=out.stdout[-300:],
                   stderr_tail=out.stderr[-300:])
        attempts.append(rec)
        print(f"bench probe attempt {attempt}: rc={out.returncode} in "
              f"{rec['duration_s']}s: {out.stdout.strip()!r}",
              file=sys.stderr, flush=True)
        if out.returncode == 0:
            lines = out.stdout.split()
            usable = bool(lines) and lines[-1] != "cpu"
            return {"usable": usable, "attempts": attempts}
    return {"usable": False, "attempts": attempts}


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


def _production_bench() -> dict:
    """The accelerator headline: the production 4-W-slice shape.

    chunks_per_slice must hold the fragmented 512k-vis slice (~5k
    occupied chunks at this UV spread); the round-4 value of 4096
    silently thinned the workload to 262k vis/slice via
    make_example_batch's fragmentation fallback."""
    from katsdpimager_tpu.parallel.multichannel import MultiChannelConfig

    cfg = MultiChannelConfig(
        pixels=4096, num_pols=1, kernel_width=60, oversample=8,
        w_planes=32, w_slices=4, chunks_per_slice=8192, chunk_size=256,
        rv=64, ru=64, minor_cycles=0, weight_type="natural")
    return run_step_bench(cfg, num_channels=8, vis_per_slice=1 << 19)


def _cpu_fallback_bench() -> dict:
    """Tiny CPU-sized twin used only when no accelerator is reachable."""
    from katsdpimager_tpu.parallel.multichannel import MultiChannelConfig

    cfg = MultiChannelConfig(
        pixels=512, num_pols=1, kernel_width=16, oversample=8,
        w_planes=8, w_slices=2, chunks_per_slice=256, chunk_size=128,
        rv=32, ru=32, minor_cycles=0)
    return run_step_bench(cfg, num_channels=2, vis_per_slice=None)


def _run_worker() -> dict | None:
    """Run the accelerator bench in a SUPERVISED SUBPROCESS.

    The axon tunnel can wedge mid-run (after a successful probe), which
    in-process would hang the whole benchmark past any driver timeout
    and record nothing.  The worker re-runs this file with --worker and
    prints its JSON on the last stdout line; the parent enforces
    KTPU_BENCH_WORKER_TIMEOUT (default 2400 s — cold-tunnel compiles
    take minutes even with the persistent cache).  Returns the parsed
    result dict, or a dict with "worker_error" diagnostics on failure.
    """
    import subprocess
    import sys
    import time as _time

    timeout_s = int(os.environ.get("KTPU_BENCH_WORKER_TIMEOUT", "2400"))
    t0 = _time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired as exc:
        return {"worker_error": "timeout",
                "worker_timeout_s": timeout_s,
                "worker_stdout_tail":
                    ((exc.stdout or b"").decode("utf-8", "replace"))[-400:]}
    diag = {"worker_rc": out.returncode,
            "worker_duration_s": round(_time.time() - t0, 1)}
    for line in reversed(out.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                continue
            if out.returncode == 0 and "value" in result:
                return result
            diag["worker_partial"] = result
            break
    diag["worker_error"] = "no result"
    diag["worker_stdout_tail"] = out.stdout[-400:]
    diag["worker_stderr_tail"] = out.stderr[-600:]
    return diag


def main():
    import sys

    if "--worker" in sys.argv:
        print(json.dumps(_production_bench()), flush=True)
        return

    # When jax_platforms is unset, don't assume CPU: the subprocess probe
    # reports the default backend's platform, so a directly attached
    # accelerator is detected even without JAX_PLATFORMS in the env.
    plat = (jax.config.jax_platforms or "").split(",")[0]
    probe = {"usable": False, "attempts": [], "note": "jax_platforms=cpu"}
    if plat != "cpu":
        probe = _probe_accelerator()
    last_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_last_tpu.json")
    worker = None
    if probe["usable"]:
        worker = _run_worker()
        if worker is not None and "value" in worker:
            # Record the accelerator result so a later fallback can
            # reference the most recent REAL measurement (clearly
            # labelled as such, never as the headline).
            try:
                stamped = dict(worker)
                stamped["recorded_at"] = time.strftime(
                    "%Y-%m-%dT%H:%M:%S%z")
                with open(last_path, "w") as f:
                    json.dump(stamped, f)
            except OSError:
                pass
            print(json.dumps(worker))
            return
    # Make a CPU fallback IMPOSSIBLE to misread as the headline: the
    # value is from a tiny CPU-sized workload, not a regression of
    # the accelerator number (round-4 lesson — BENCH_r04.json).
    jax.config.update("jax_platforms", "cpu")
    result = _cpu_fallback_bench()
    result["fallback"] = True
    result["fallback_reason"] = ("accelerator probe or worker failed; "
                                 "tiny CPU-sized workload, NOT comparable "
                                 "to accelerator rounds")
    result["probe"] = probe
    if worker is not None:
        result["worker"] = worker
    try:
        with open(last_path) as f:
            # The most recent REAL accelerator measurement (with its
            # recorded_at timestamp) — context for the reader, NOT this
            # run's headline.
            result["last_accelerator_result"] = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
