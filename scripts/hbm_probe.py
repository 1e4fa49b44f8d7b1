"""Measure achievable HBM stream bandwidth through the tunnel.

Times y = x + 1 (read+write), zeros-write, and a 2-array add at several
sizes, reporting effective GB/s (marginal over sizes removes the
dispatch floor).  Calibrates the per-slice fixed-cost model in
doc/PERFORMANCE.md.

Usage: python scripts/hbm_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def bench(fn, *args, iters=10):
    r = fn(*args)
    float(r)
    t0 = time.perf_counter()
    vals = [fn(*args) for _ in range(iters)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    for mb in (128, 512, 1024):
        n = mb * (1 << 20) // 4

        @jax.jit
        def addone(x):
            return jnp.sum((x + 1.0)[::65536])

        @jax.jit
        def zeros():
            z = jnp.zeros((n,), jnp.float32)
            return jnp.sum(z[::65536])

        @jax.jit
        def add2(x, y):
            return jnp.sum((x + y)[::65536])

        x = jnp.ones((n,), jnp.float32)
        y = jnp.ones((n,), jnp.float32)
        t_add1 = bench(addone, x)
        t_zero = bench(zeros)
        t_add2 = bench(add2, x, y)
        gb = mb / 1024
        print(f"{mb:5d} MB: x+1 {t_add1 * 1e3:7.2f} ms "
              f"({2 * gb / t_add1:6.1f} GB/s rw)  "
              f"zeros {t_zero * 1e3:7.2f} ms ({gb / t_zero:6.1f} GB/s w)  "
              f"x+y {t_add2 * 1e3:7.2f} ms ({3 * gb / t_add2:6.1f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
