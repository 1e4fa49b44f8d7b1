"""One-off TPU sweep of dense-gridder assembly candidates.

Runs autotune._measure for a list of (assembly, group) candidates at the
K=60 / 4k-grid / 1M-vis design point and prints one JSON line per
candidate.  Used to pick defaults; results land in doc/PERFORMANCE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from katsdpimager_tpu.ops import autotune  # noqa: E402


def main():
    cands = sys.argv[1:] or ["tapsmm:128", "tapsmm:256", "matmul:128"]
    geo = dict(pixels=4096, kernel_width=60, num_pols=1, ts=64, mc=256)
    n_vis = 1 << 20
    for cand in cands:
        parts = cand.split(":")
        assembly, group = parts[0], parts[1]
        if len(parts) > 2:
            geo = dict(geo, mc=int(parts[2]))
        t0 = time.perf_counter()
        dt = autotune._measure(assembly, int(group), **geo, n_vis=n_vis)
        wall = time.perf_counter() - t0
        ggaps = n_vis * geo["kernel_width"] ** 2 / dt / 1e9
        print(json.dumps({
            "assembly": assembly, "group": int(group),
            "sec_per_call": round(dt, 4), "ggaps": round(ggaps, 2),
            "mvis_per_s": round(n_vis / dt / 1e6, 2),
            "total_wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
