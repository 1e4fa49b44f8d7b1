"""Benchmark the native (C++/OpenMP) preprocessing collector.

Host-data-plane throughput harness for the VERDICT-r2 #2 work: measures
ktpu_preprocess_channel end-to-end at the MeerKAT-64 wave point
(XX,YY,XY,YX -> I, clustered UV) and prints Mvis/s.  Stage timing comes
from the library's KTPU_NATIVE_PROFILE=1 stderr output.

Usage: python benchmarks/preprocess_native.py [n_vis] [pixels] [repeats]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("KTPU_NATIVE_PROFILE", "1")

from katsdpimager_tpu import native  # noqa: E402
from katsdpimager_tpu.preprocess import ChannelGeometry  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 7_200_000
    pixels = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    rng = np.random.default_rng(0)
    geom = ChannelGeometry(pixels=pixels, cell_size=10.0, oversample=8,
                           w_slices=8, w_planes=32, max_w=4000.0,
                           kernel_width=60)
    # Clustered UV (Gaussian, like a real array's dense core), |w| < max_w.
    extent = geom.cell_size * (pixels / 2 - geom.kernel_width)
    uvw = np.empty((n, 3), np.float32)
    uvw[:, :2] = rng.normal(scale=extent / 4, size=(n, 2))
    np.clip(uvw[:, :2], -extent, extent, out=uvw[:, :2])
    uvw[:, 2] = rng.normal(scale=geom.max_w / 4, size=n)
    Q, P = 4, 1
    vis = (rng.normal(size=(n, Q)) + 1j * rng.normal(size=(n, Q))
           ).astype(np.complex64)
    weights = rng.uniform(0.5, 2.0, size=(n, Q)).astype(np.float32)
    # XX,YY -> I style Mueller row (Q=4 with zero cross terms).
    mueller = np.array([[0.5, 0.0, 0.0, 0.5]], np.complex64)

    assert native.available()
    print(f"threads={native.load().ktpu_num_threads()}  n={n}  "
          f"pixels={pixels}")
    best = None
    for r in range(repeats):
        t0 = time.perf_counter()
        out = native.preprocess_channel(uvw, weights, vis, mueller, geom)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        print(f"  run {r}: {dt * 1e3:.0f} ms  ({n / dt / 1e6:.2f} Mvis/s)  "
              f"merged={out['count']} ({out['count'] / n:.2f}x)")
    print(f"best: {n / best / 1e6:.2f} Mvis/s")


if __name__ == "__main__":
    main()
