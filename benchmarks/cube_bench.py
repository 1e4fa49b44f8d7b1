"""Cube-wave benchmark at the BASELINE 512-channel target geometry.

Runs ONE wave of the production cube pipeline (weights + PSF + 2 major
cycles with degridding + 1024 on-device minor cycles + noise estimation)
per channel at the BASELINE.md target geometry — 8k-pixel MeerKAT-64-class
image, K=60, 4 W slices — on however many devices are attached, and
reports seconds per channel per chip.  512-channel-cube throughput on a
pod slice is ``512 / (s_per_channel / n_chips)`` assuming channel data
parallelism (validated by the shard-invariance tests).

Usage: python benchmarks/cube_bench.py [pixels] [vis_per_slice_log2] [pols]

``pols=4`` runs the full-Stokes (IQUV) wave for the BASELINE IQUV
s/channel row (VERDICT r3 item 5).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # jax is preloaded at interpreter startup in this session; the env
    # var alone is too late (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import numpy as np  # noqa: E402

from katsdpimager_tpu.parallel import cube, make_mesh  # noqa: E402
from katsdpimager_tpu.parallel.multichannel import (  # noqa: E402
    MultiChannelConfig, make_example_batch,
)


def main():
    on_accel = jax.devices()[0].platform != "cpu"
    pixels = int(sys.argv[1]) if len(sys.argv) > 1 else (8192 if on_accel
                                                        else 256)
    vps = 1 << (int(sys.argv[2]) if len(sys.argv) > 2
                else (19 if on_accel else 12))
    pols = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    if on_accel:
        # 16k chunk capacity: at 8k pixels the synthetic UV cloud spans
        # ~16k occupied 64-px tiles, and occupied-chunk loop bounds make
        # capacity nearly free.  Full-Stokes at 8k needs a tighter
        # layout to fit HBM (the P=4 batch payloads alone are ~5 GB at
        # 16k capacity); KTPU_CUBE_NC overrides.
        nc_default = 16384 if pols == 1 else 10240
        geo = dict(num_pols=pols, kernel_width=60, oversample=8,
                   w_planes=32, w_slices=4,
                   chunks_per_slice=int(os.environ.get("KTPU_CUBE_NC",
                                                       str(nc_default))),
                   chunk_size=256, rv=64, ru=64)
        clean = dict(majors=2, minor=1024, patch=257, psf_core=64,
                     border_pixels=pixels // 50, loop_gain=0.1)
    else:
        geo = dict(num_pols=pols, kernel_width=12, oversample=8,
                   w_planes=4, w_slices=2, chunks_per_slice=64,
                   chunk_size=64, rv=32, ru=32)
        clean = dict(majors=1, minor=32, patch=33, psf_core=32,
                     border_pixels=8, loop_gain=0.1)

    mcfg = MultiChannelConfig(pixels=pixels, minor_cycles=0, **geo)
    batch = make_example_batch(mcfg, jax.device_count(),
                               vis_per_slice=vps)
    num_vis = int(np.asarray(batch.valid).sum())

    ccfg = cube.CubeConfig(pixels=pixels, **geo, **clean)
    mesh = make_mesh(vis_shards=1)
    wave = cube.make_wave_image(mesh, ccfg)

    def run():
        result = wave(batch)
        # scalar fetch = the only reliable tunnel sync
        return float(np.asarray(result.noise).sum())

    run()  # compile + warm
    iters = 2
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    n_chan = batch.kernel.shape[0]
    per_channel_chip = dt / n_chan * jax.device_count()
    print(json.dumps({
        "metric": "cube_wave_s_per_channel_per_chip",
        "value": round(per_channel_chip, 3),
        "unit": "s/channel/chip",
        "channels_per_s_per_chip": round(1.0 / per_channel_chip, 3),
        "pixels": pixels,
        "num_pols": pols,
        "num_vis": num_vis,
        "majors": ccfg.majors,
        "minor": ccfg.minor,
        "devices": jax.device_count(),
    }))


if __name__ == "__main__":
    main()
