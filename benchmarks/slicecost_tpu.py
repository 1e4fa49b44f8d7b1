"""Decompose the per-W-slice fixed cost on the TPU (VERDICT r2 item 1).

The cube/channel step pays, per W slice and independent of visibility
count: dense tile-array init, the 4-colour combine, the FFT, and the
taper/n/W-phase correction.  Round 2 measured ~22 ms/slice at 4k.  This
harness times each stage in isolation so the attack order is driven by
data:

- ``init``    : zeros((P, ext, ext)) + checksum (tile-array init write)
- ``combine`` : + the dense->grid colour combine (slice of gpad)
- ``xlafft``  : ifft2 via the XLA custom call on (P, N, N)
- ``mxufft``  : ifft2 via the MXU four-step matmul FFT
- ``fixup``   : grid_to_image elementwise corrections (shift-free)
- ``g2i_xla`` / ``g2i_mxu`` : full grid_to_image with each FFT
- ``g2i_mxu_batched`` : batched over S=4 slices in one call

Usage: python benchmarks/slicecost_tpu.py [stage ...] [--pixels N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # jax is preloaded at interpreter startup in this session; the env var
    # alone is too late (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from katsdpimager_tpu.ops import fft as mfft  # noqa: E402
from katsdpimager_tpu.ops import fourier, mxu_gridder  # noqa: E402

P = 1
TS = 64


def bench(fn, args, iters=10):
    r = fn(*args)
    s = float(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = float(r)
    return (time.perf_counter() - t0) / iters * 1e3, s


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pixels = 4096
    for a in sys.argv[1:]:
        if a.startswith("--pixels"):
            pixels = int(a.split("=", 1)[1])
    N = pixels
    ext = mxu_gridder.dense_pad_size(N, TS)
    stages = args or ["init", "combine", "xlafft", "mxufft", "fixup",
                      "g2i_xla", "g2i_mxu", "g2i_pallas", "i2g_xla",
                      "i2g_pallas", "g2i_mxu_batched"]

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.normal(size=(P, N, N)).astype(np.float32))
    im = jnp.asarray(rng.normal(size=(P, N, N)).astype(np.float32))
    re4 = jnp.asarray(rng.normal(size=(4, P, N, N)).astype(np.float32))
    im4 = jnp.asarray(rng.normal(size=(4, P, N, N)).astype(np.float32))
    taper = jnp.asarray((0.5 + rng.random(N)).astype(np.float32))
    pxs = jnp.asarray(1e-5, jnp.float32)
    wmid = jnp.asarray(150.0, jnp.float32)
    wmid4 = jnp.asarray(np.linspace(50, 400, 4).astype(np.float32))

    @jax.jit
    def init_only():
        g = jnp.zeros((P, ext, ext), jnp.complex64)
        return jnp.sum(jnp.abs(g.real)) + 1.0

    @jax.jit
    def combine(re, im):
        g = jnp.zeros((P, ext, ext), jnp.complex64)
        g = g.at[:, :N, :N].add(re + 1j * im)
        out = g[:, :N, :N]
        return jnp.sum(jnp.abs(out.real))

    @jax.jit
    def xlafft(re, im):
        y = jnp.fft.ifft2(re + 1j * im, axes=(-2, -1))
        return jnp.sum(jnp.abs(y.real))

    @jax.jit
    def mxufft(re, im):
        y = mfft.ifft2(re + 1j * im)
        return jnp.sum(jnp.abs(y.real))

    @jax.jit
    def fixup(re, im):
        cb = fourier._checkerboard(N, jnp.float32)
        n = fourier._lm_grids(N, pxs, jnp.float32)
        phase = (2 * jnp.pi) * wmid * (n - 1.0)
        t2 = jnp.outer(taper, taper)
        common = cb * (n * (N * N)) / t2
        out = re * (jnp.cos(phase) * common) + im * (-jnp.sin(phase) * common)
        return jnp.sum(jnp.abs(out))

    def g2i(which):
        @jax.jit
        def f(re, im):
            os.environ["KTPU_FFT"] = which
            img = jnp.zeros((P, N, N), jnp.float32)
            out = fourier.grid_to_image_impl(re + 1j * im, img, taper,
                                             wmid, pxs, pixels=N)
            return jnp.sum(jnp.abs(out))
        return f

    def i2g(which):
        @jax.jit
        def f(re, im):
            os.environ["KTPU_FFT"] = which
            out = fourier.image_to_grid_impl(re, taper, wmid, pxs,
                                             pixels=N)
            return jnp.sum(jnp.abs(out.real))
        return f

    @jax.jit
    def g2i_batched(re4, im4):
        os.environ["KTPU_FFT"] = "mxu"
        img = jnp.zeros((P, N, N), jnp.float32)

        def body(img, xs):
            r, i, w = xs
            return fourier.grid_to_image_impl(r + 1j * i, img, taper, w,
                                              pxs, pixels=N), None

        # batched: all four FFTs in one call, corrections vmapped
        layer = mfft.ifft2((re4 + 1j * im4)
                           * fourier._checkerboard(N, jnp.float32))
        n = fourier._lm_grids(N, pxs, jnp.float32)
        cb = fourier._checkerboard(N, jnp.float32)
        t2 = jnp.outer(taper, taper)
        common = cb * (n * (N * N)) / t2
        phase = (2 * jnp.pi) * wmid4[:, None, None, None] * (n - 1.0)
        out = img + jnp.sum(layer.real * (jnp.cos(phase) * common)
                            + layer.imag * (-jnp.sin(phase) * common),
                            axis=0)
        return jnp.sum(jnp.abs(out))

    table = {
        "init": (init_only, ()),
        "combine": (combine, (re, im)),
        "xlafft": (xlafft, (re, im)),
        "mxufft": (mxufft, (re, im)),
        "fixup": (fixup, (re, im)),
        "g2i_xla": (g2i("xla"), (re, im)),
        "g2i_mxu": (g2i("mxu"), (re, im)),
        "g2i_pallas": (g2i("pallas"), (re, im)),
        "i2g_xla": (i2g("xla"), (re, im)),
        "i2g_pallas": (i2g("pallas"), (re, im)),
        "g2i_mxu_batched": (g2i_batched, (re4, im4)),
    }
    for name in stages:
        fn, a = table[name]
        ms, s = bench(fn, a)
        print(f"{name:16s} {ms:8.2f} ms  checksum={s:.4g}")


if __name__ == "__main__":
    main()
