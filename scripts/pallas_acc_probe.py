"""On-chip element-wise accuracy probe: fused Pallas vs XLA tapdict grid.

The A/B harness compares sum(|grid|) checksums, which aggregates and can
hide localized errors.  This probe jits BOTH assemblies over identical
inputs and fetches max|diff| / max|grid| scalars computed on device, plus
the same ratio against the f64 scatter oracle computed on host.

Usage: python scripts/pallas_acc_probe.py [n_vis] [pixels] [K] [w_planes]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from katsdpimager_tpu.ops import mxu_gridder  # noqa: E402


def main() -> None:
    on_accel = jax.devices()[0].platform != "cpu"
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (
        1 << 18 if on_accel else 1 << 13)
    pixels = int(sys.argv[2]) if len(sys.argv) > 2 else (
        2048 if on_accel else 512)
    K = int(sys.argv[3]) if len(sys.argv) > 3 else (60 if on_accel else 16)
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    O, TS, MC = 8, 64, 256

    rng = np.random.default_rng(0)
    kernel = (rng.normal(size=(W, O, K))
              + 1j * rng.normal(size=(W, O, K))).astype(np.complex64)
    lim = pixels // 2 - K - 1
    uv = np.clip(rng.normal(scale=lim / 3, size=(n, 2)), -lim, lim
                 ).astype(np.int16)
    sub = rng.integers(0, O, size=(n, 2)).astype(np.int16)
    wp = rng.integers(0, W, size=n).astype(np.int16)
    vis = (rng.normal(size=(n, 1))
           + 1j * rng.normal(size=(n, 1))).astype(np.complex64)
    plan = mxu_gridder.plan_chunks_tiled(
        uv, sub, wp, vis, np.ones((n, 1), np.float32),
        pixels=pixels, kernel_width=K, ts=TS, mc=MC)

    def pair(x):
        return jnp.asarray(np.stack([x.real, x.imag], -1).astype(np.float32))

    kp = pair(kernel)
    vp = pair(np.asarray(plan.vis))
    pj = [jnp.asarray(x) for x in (plan.uv, plan.sub_uv, plan.w_plane,
                                   plan.anchor, plan.valid)]
    nc = mxu_gridder.occupied_chunks(pj[4])
    ext = mxu_gridder.dense_pad_size(pixels, TS)

    @jax.jit
    def both(kp, vp, *p):
        kern_c = lax.complex(kp[..., 0], kp[..., 1])
        vis_c = lax.complex(vp[..., 0], vp[..., 1])
        outs = {}
        for assembly in ("tapdict", "pallas"):
            gpad = jnp.zeros((1, ext, ext), jnp.complex64)
            outs[assembly] = mxu_gridder.grid_chunks_dense_impl(
                gpad, kern_c, None, p[0], p[1], p[2], vis_c,
                p[3], p[4], None, nc, pixels=pixels, ts=TS,
                assembly=assembly)
        d = jnp.max(jnp.abs(outs["pallas"] - outs["tapdict"]))
        m = jnp.max(jnp.abs(outs["tapdict"]))
        # mean |diff| over occupied area says biased-vs-localized
        md = jnp.mean(jnp.abs(outs["pallas"] - outs["tapdict"]))
        mm = jnp.mean(jnp.abs(outs["tapdict"]))
        return d, m, md, mm

    d, m, md, mm = (float(x) for x in both(kp, vp, *pj))
    print(f"max|pallas-tapdict| = {d:.3e}  max|grid| = {m:.3e}  "
          f"rel = {d / m:.3e}", flush=True)
    print(f"mean|diff| = {md:.3e}  mean|grid| = {mm:.3e}  "
          f"rel = {md / mm:.3e}", flush=True)

    # f64 scatter oracle on host (valid rows only; vectorized per row —
    # the tests' grid_vis_reference is too slow at this K/N)
    val = np.asarray(plan.valid).reshape(-1).astype(bool)
    k64 = np.asarray(kernel).astype(np.complex128)
    uvv = np.asarray(plan.uv).reshape(-1, 2)[val]
    subv = np.asarray(plan.sub_uv).reshape(-1, 2)[val]
    wpv = np.asarray(plan.w_plane).reshape(-1)[val].astype(np.int64)
    visv = np.asarray(plan.vis).reshape(-1, 1)[val].astype(np.complex128)
    uv_bias = (K - 1) // 2 - pixels // 2
    g64 = np.zeros((1, pixels, pixels), np.complex128)
    for row in range(len(uvv)):
        u0 = int(uvv[row, 0]) - uv_bias
        v0 = int(uvv[row, 1]) - uv_bias
        ku = np.conj(k64[wpv[row], int(subv[row, 0])])
        kv = np.conj(k64[wpv[row], int(subv[row, 1])])
        g64[:, v0:v0 + K, u0:u0 + K] += (visv[row][:, None, None]
                                         * np.outer(kv, ku))
    for assembly in ("tapdict", "pallas"):
        @jax.jit
        def onepad(kp, vp, *p, assembly=assembly):
            kern_c = lax.complex(kp[..., 0], kp[..., 1])
            vis_c = lax.complex(vp[..., 0], vp[..., 1])
            gpad = jnp.zeros((1, ext, ext), jnp.complex64)
            out = mxu_gridder.grid_chunks_dense_impl(
                gpad, kern_c, None, p[0], p[1], p[2], vis_c,
                p[3], p[4], None, nc, pixels=pixels, ts=TS,
                assembly=assembly)
            crop = out[:, :pixels, :pixels]
            return (jnp.real(crop).astype(jnp.float32),
                    jnp.imag(crop).astype(jnp.float32))

        re, im = onepad(kp, vp, *pj)
        g = np.asarray(re) + 1j * np.asarray(im)
        err = np.max(np.abs(g - g64)) / np.max(np.abs(g64))
        print(f"{assembly} vs f64 oracle: rel max err = {err:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
