"""Restore-convolution r2c A/B (VERDICT r4 item 6).

Times the CLEAN-model restoring-beam convolution at the 8k point with
the shipped rfft2/irfft2 pair against the round-4 complex fft2/ifft2
formulation (reference beam.py:235-260 uses r2c/c2r cuFFT plans).

Usage: python benchmarks/beam_tpu.py [pixels] [num_pols]
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
from functools import partial  # noqa: E402

from katsdpimager_tpu.ops import beam as beam_ops  # noqa: E402


@partial(jax.jit, static_argnames=("pixels",))
def _convolve_c2c(model, M, amplitude, *, pixels: int):
    """The round-4 complex-pair formulation (the A side of the A/B)."""
    model_ft = jnp.fft.fft2(model, axes=(-2, -1))
    u = jnp.fft.fftfreq(pixels)
    v = jnp.fft.fftfreq(pixels)
    coords = jnp.stack(jnp.meshgrid(u, v, indexing="ij"), axis=-1)
    rotated = jnp.einsum("yxj,ij->yxi", coords, M, precision="highest")
    r2 = jnp.sum(rotated ** 2, axis=-1)
    beam_ft = amplitude * jnp.exp(-2.0 * (jnp.pi ** 2) * r2)
    out = jnp.fft.ifft2(model_ft * beam_ft[None], axes=(-2, -1)).real
    return out.astype(model.dtype)


def main():
    on_accel = jax.devices()[0].platform != "cpu"
    pixels = int(sys.argv[1]) if len(sys.argv) > 1 else (
        8192 if on_accel else 512)
    pols = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    rng = np.random.default_rng(0)
    model = jnp.asarray(rng.normal(size=(pols, pixels, pixels))
                        .astype(np.float32))
    b = beam_ops.Beam(8.0, 5.0, 0.3)
    M = jnp.asarray(b.covariance_sqrt(), np.float32)
    amp = np.float32(2 * np.pi * abs(np.linalg.det(b.covariance_sqrt())))

    def bench(fn):
        s = float(jnp.sum(jnp.abs(fn())))   # compile + sync
        iters = 5
        t0 = time.perf_counter()
        vals = [fn() for _ in range(iters)]
        for v in vals:
            float(jnp.sum(jnp.abs(v)))
        return (time.perf_counter() - t0) / iters * 1e3, s

    ms_r2c, s1 = bench(lambda: beam_ops._convolve(model, M, amp,
                                                  pixels=pixels))
    ms_c2c, s2 = bench(lambda: _convolve_c2c(model, M, amp, pixels=pixels))
    print(json.dumps({
        "metric": "restore_convolve_ms",
        "pixels": pixels, "num_pols": pols,
        "r2c_ms": round(ms_r2c, 2), "c2c_ms": round(ms_c2c, 2),
        "speedup": round(ms_c2c / ms_r2c, 2),
        "checksum_agree": bool(abs(s1 - s2) < 1e-3 * abs(s1)),
    }))


if __name__ == "__main__":
    main()
