"""Fused Pallas gridder vs XLA tapdict: on-chip A/B (VERDICT r3 item 7).

Times ``grid_chunks_dense_impl`` with ``assembly="tapdict"`` (the XLA
default, gather-bound at 29-34 ms/1M vis) against ``assembly="pallas"``
(the fused Mosaic kernel: VMEM factor assembly, no taps-table gathers)
at the production point, after validating their checksums agree.

Usage: python benchmarks/pallas_tpu.py [n_vis] [pixels] [K] [w_planes]
"""

import json
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from katsdpimager_tpu.ops import mxu_gridder  # noqa: E402


def main() -> None:
    on_accel = jax.devices()[0].platform != "cpu"
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    ns = ([int(x) for x in pos[0].split(",")] if len(pos) > 0
          else [(1 << 20) if on_accel else (1 << 14)])
    pixels = int(pos[1]) if len(pos) > 1 else (4096 if on_accel else 512)
    K = int(pos[2]) if len(pos) > 2 else (60 if on_accel else 16)
    W = int(pos[3]) if len(pos) > 3 else 32
    which = pos[4:] or ["tapdict", "pallas"]
    degrid = "--degrid" in sys.argv
    for n in ns:
        run_point(n, pixels, K, W, which, degrid)


def run_point(n, pixels, K, W, which, degrid=False) -> None:
    O, TS = 8, 64
    MC = int(os.environ.get("KTPU_BENCH_MC", "256"))
    P = int(os.environ.get("KTPU_BENCH_POLS", "1"))

    rng = np.random.default_rng(0)
    kernel = (rng.normal(size=(W, O, K))
              + 1j * rng.normal(size=(W, O, K))).astype(np.complex64)
    lim = pixels // 2 - K - 1
    uv = np.clip(rng.normal(scale=lim / 3, size=(n, 2)), -lim, lim
                 ).astype(np.int16)
    sub = rng.integers(0, O, size=(n, 2)).astype(np.int16)
    wp = rng.integers(0, W, size=n).astype(np.int16)
    vis = (rng.normal(size=(n, P))
           + 1j * rng.normal(size=(n, P))).astype(np.complex64)
    plan = mxu_gridder.plan_chunks_tiled(
        uv, sub, wp, vis, np.ones((n, P), np.float32),
        pixels=pixels, kernel_width=K, ts=TS, mc=MC)
    n_occ = int(np.asarray(mxu_gridder.occupied_chunks(plan.valid)))
    print(f"n={n} pixels={pixels} K={K} W={W} "
          f"chunks={n_occ}/{plan.uv.shape[0]}", flush=True)

    def pair(x):
        return jnp.asarray(np.stack([x.real, x.imag], -1).astype(np.float32))

    kp = pair(kernel)
    vp = pair(np.asarray(plan.vis))
    pj = [jnp.asarray(x) for x in (plan.uv, plan.sub_uv, plan.w_plane,
                                   plan.anchor, plan.valid)]
    nc = mxu_gridder.occupied_chunks(pj[4])
    ext = mxu_gridder.dense_pad_size(pixels, TS)

    if degrid:
        rngg = np.random.default_rng(1)
        gsrc = (rngg.normal(size=(P, pixels + TS, pixels + TS))
                + 1j * rngg.normal(size=(P, pixels + TS, pixels + TS))
                ).astype(np.complex64)
        gp = pair(gsrc)
        wtj = jnp.asarray(np.asarray(plan.weights))

    def run(assembly):
        def f(kp, vp, *p):
            gpad = jnp.zeros((P, ext, ext), jnp.complex64)
            out = mxu_gridder.grid_chunks_dense_impl(
                gpad, lax.complex(kp[..., 0], kp[..., 1]), None,
                p[0], p[1], p[2], lax.complex(vp[..., 0], vp[..., 1]),
                p[3], p[4], None, nc,
                pixels=pixels, ts=TS, assembly=assembly)
            return jnp.sum(jnp.abs(out))

        def f_degrid(kp, vp, gp, wtj, *p):
            out = mxu_gridder.degrid_chunks_impl(
                lax.complex(gp[..., 0], gp[..., 1]),
                lax.complex(kp[..., 0], kp[..., 1]),
                p[0], p[1], p[2], wtj,
                lax.complex(vp[..., 0], vp[..., 1]),
                p[3], p[4], nc,
                pixels=pixels, rv=TS, ru=TS, assembly=assembly,
                tile_aligned=True)
            return jnp.sum(jnp.abs(out))

        if degrid:
            fn = jax.jit(f_degrid)
            args = (kp, vp, gp, wtj, *pj)
        else:
            fn = jax.jit(f)
            args = (kp, vp, *pj)

        cks = float(fn(*args))
        iters = 5
        t0 = time.perf_counter()
        vals = [fn(*args) for _ in range(iters)]
        for x in vals:
            float(x)
        dt = (time.perf_counter() - t0) / iters
        ggaps = n * K * K / dt / 1e9
        print(json.dumps({"assembly": assembly, "n": n,
                          "ms": round(dt * 1e3, 2),
                          "ggaps": round(ggaps, 1), "checksum": cks}),
              flush=True)
        return cks

    sums = {a: run(a) for a in which}
    if len(sums) > 1:
        vals = list(sums.values())
        rel = abs(vals[0] - vals[1]) / max(abs(vals[0]), 1e-9)
        print(f"checksum rel diff: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
