"""Pallas band-accumulate gridder: TPU compile probe + A/B vs XLA dense.

Round-3 aligned-window formulation (ops/pallas_gridder.py): checks that
Mosaic accepts the kernel through the tunnel, validates numerics against
the XLA scatter-free path on device, and times both at a production-ish
point for the VERDICT-r2 weak-#5 decision.

Usage: python benchmarks/pallas_tpu.py [n_vis] [pixels] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from katsdpimager_tpu.ops import mxu_gridder, pallas_gridder


def main() -> None:
    on_accel = jax.devices()[0].platform != "cpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (
        1 << 20 if on_accel else 1 << 14)
    pixels = int(sys.argv[2]) if len(sys.argv) > 2 else (
        4096 if on_accel else 512)
    K = int(sys.argv[3]) if len(sys.argv) > 3 else (60 if on_accel else 16)

    rng = np.random.default_rng(0)
    W, O = 32, 8
    kernel = (rng.normal(size=(W, O, K))
              + 1j * rng.normal(size=(W, O, K))).astype(np.complex64)
    lim = pixels // 2 - K - 1
    uv = np.clip(rng.normal(scale=lim / 3, size=(n, 2)), -lim, lim
                 ).astype(np.int16)
    sub = rng.integers(0, O, size=(n, 2)).astype(np.int16)
    wp = rng.integers(0, W, size=n).astype(np.int16)
    vis = (rng.normal(size=(n, 1))
           + 1j * rng.normal(size=(n, 1))).astype(np.complex64)
    wg = np.ones((1, pixels, pixels), np.float32)

    ts = 64
    g = mxu_gridder.MxuGridder(pixels=pixels, kernel_width=K, num_pols=1,
                               rv=ts, ru=ts, mc=256)
    plan = g.plan(uv, sub, wp, vis, np.ones_like(vis, np.float32))
    nc = int(plan.valid.any(axis=1).sum())
    print(f"n={n} pixels={pixels} K={K} chunks={nc}/{plan.uv.shape[0]}")

    from katsdpimager_tpu import xfer

    kern_d = xfer.device_complex(kernel)
    vis_d = xfer.device_complex(plan.vis)
    uv_d, sub_d, wp_d = (jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
                         jnp.asarray(plan.w_plane))
    anc_d, val_d = jnp.asarray(plan.anchor), jnp.asarray(plan.valid)
    wg_d = jnp.asarray(wg)

    def sync(x):
        return float(jnp.sum(jnp.abs(x).astype(jnp.float32)))

    def run_xla():
        ext = mxu_gridder.dense_pad_size(pixels, ts)
        gpad = jnp.zeros((1, ext, ext), jnp.complex64)
        out = mxu_gridder.grid_chunks_dense_impl(
            gpad, kern_d, None, uv_d, sub_d, wp_d, vis_d, anc_d, val_d,
            None, jnp.int32(nc), pixels=pixels, ts=ts,
            assembly=mxu_gridder.default_assembly())
        return out[:, :pixels, :pixels]

    def run_pallas():
        gpad = xfer.device_zeros((1, pixels + ts, pixels + ts),
                                 jnp.complex64)
        out = pallas_gridder.grid_chunks_pallas(
            gpad, kern_d, wg_d, uv_d, sub_d, wp_d, vis_d, anc_d, val_d,
            pixels=pixels, rv=ts, ru=ts, interpret=not on_accel)
        return out[:, :pixels, :pixels]

    gaps = n * K * K / 1e9
    for name, fn in [("xla_dense", run_xla), ("pallas", run_pallas)]:
        try:
            t0 = time.perf_counter()
            ref = sync(fn())
            compile_t = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(fn())
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(f"{name}: {dt * 1e3:.1f} ms  {gaps / dt:.1f} GGAPS  "
                  f"(compile+1st {compile_t:.1f}s, checksum {ref:.1f})")
        except Exception as exc:  # compile rejection is a RESULT here
            print(f"{name}: FAILED {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
