"""Decompose the driver-bench step (bench.py workload) on the TPU.

bench.py measures an 8-channel lax.map over the full single-channel step
(natural weights, 1 W slice, 4k, K=60, 1M vis/channel).  Round 3 halved
grid_to_image in isolation (slicecost_tpu.py: 18.5 -> 10 ms) yet the
bench number did not move — this harness times stage-stripped variants of
the SAME batched dispatch to see where the per-channel time actually
goes:

- ``plumb``  : lax.map + input plumbing + checksum only (no compute)
- ``grid``   : + dense MXU gridding per slice (checksum of gpad)
- ``full``   : the shipped step (grid + grid_to_image + residual checksum)
- ``cheapck``: full, with a single-pixel checksum (prices the strided
               abs-sum checksum)

Usage: python benchmarks/stepdecomp_tpu.py [variant ...]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from katsdpimager_tpu import xfer  # noqa: E402
from katsdpimager_tpu.ops import mxu_gridder  # noqa: E402
from katsdpimager_tpu.ops.fourier import grid_to_image_impl  # noqa: E402
from katsdpimager_tpu.parallel.multichannel import (  # noqa: E402
    MultiChannelConfig, make_example_batch, single_channel_step,
)


def _pair(x):
    return jnp.asarray(np.stack([x.real, x.imag], axis=-1).astype(np.float32))


def main():
    on_accel = jax.devices()[0].platform != "cpu"
    # Production 4-W-slice shape (bench.py round 4); --w1 keeps the old
    # single-slice workload for cross-round comparability.
    slices = 1 if "--w1" in sys.argv else 4
    mc = int(os.environ.get("KTPU_SD_MC", "256"))
    if on_accel:
        nc_default = (8192 if slices == 1 else 4096) * 256 // mc
        cfg = MultiChannelConfig(
            pixels=4096, num_pols=1, kernel_width=60, oversample=8,
            w_planes=32, w_slices=slices,
            chunks_per_slice=int(os.environ.get("KTPU_SD_NC",
                                                str(nc_default))),
            chunk_size=mc,
            rv=64, ru=64, minor_cycles=0, weight_type="natural")
        num_channels = 8
        vis_per_slice = (1 << 20) if slices == 1 else (1 << 19)
    else:
        cfg = MultiChannelConfig(
            pixels=512, num_pols=1, kernel_width=16, oversample=8,
            w_planes=8, w_slices=2, chunks_per_slice=256, chunk_size=128,
            rv=32, ru=32, minor_cycles=0)
        num_channels = 2
        vis_per_slice = None

    batch = make_example_batch(cfg, num_channels, vis_per_slice=vis_per_slice)
    num_vis = int(np.asarray(batch.valid).sum())
    base = single_channel_step(cfg)
    N = cfg.pixels

    kern_p = _pair(xfer.fetch_complex(batch.kernel))
    vis_p = _pair(xfer.fetch_complex(batch.vis))
    rest = [jnp.asarray(np.asarray(x)) for x in
            (batch.taper1d, batch.pixel_size, batch.mid_w, batch.uv,
             batch.sub_uv, batch.w_plane, batch.anchor, batch.valid,
             batch.weights)]

    def batched(one):
        @jax.jit
        def step(kp, vp, *rest_args):
            kernel = lax.complex(kp[..., 0], kp[..., 1])
            vis = lax.complex(vp[..., 0], vp[..., 1])
            sums = lax.map(one, (kernel, vis) + tuple(rest_args))
            return jnp.sum(sums)
        return step

    def one_plumb(args):
        kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
        return jnp.sum(jnp.abs(vis_c[:, ::16, ::16]))

    def grid_slices(kern_c, uv, sub, wpl, anc, val, wts, vis_c):
        ext = mxu_gridder.dense_pad_size(N, cfg.rv)
        nc_slices = jnp.sum(jnp.any(val, axis=-1).astype(jnp.int32), axis=-1)

        def one_slice(xs):
            uv_s, sub_s, wp_s, anc_s, val_s, vis_s, nc_s = xs
            gpad = jnp.zeros((cfg.num_pols, ext, ext), vis_s.dtype)
            return mxu_gridder.grid_chunks_dense_impl(
                gpad, kern_c, None, uv_s, sub_s, wp_s, vis_s, anc_s,
                val_s, None, nc_s, pixels=N, ts=cfg.rv,
                assembly=mxu_gridder.default_assembly())

        return lax.map(one_slice,
                       (uv, sub, wpl, anc, val, vis_c, nc_slices))

    def one_grid(args):
        kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
        gpads = grid_slices(kern_c, uv, sub, wpl, anc, val, wts, vis_c)
        return jnp.sum(jnp.abs(gpads[:, :, ::64, ::64]))

    def one_g2i(args):
        kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
        gpads = grid_slices(kern_c, uv, sub, wpl, anc, val, wts, vis_c)
        dirty = jnp.zeros((cfg.num_pols, N, N), t.dtype)
        for s in range(cfg.w_slices):
            dirty = grid_to_image_impl(gpads[s, :, :N, :N], dirty, t,
                                       mw[s], ps, pixels=N)
        return jnp.sum(jnp.abs(dirty[:, ::64, ::64]))

    def one_full(args):
        kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
        residual, _model = base(kern_c, t, ps, mw, uv, sub, wpl, anc,
                                val, wts, vis_c)
        return jnp.sum(jnp.abs(residual[:, ::64, ::64]))

    def one_cheapck(args):
        kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
        residual, _model = base(kern_c, t, ps, mw, uv, sub, wpl, anc,
                                val, wts, vis_c)
        return jnp.sum(jnp.real(residual[:, 0, :128]))

    def single(one):
        """Channel 0 only, no lax.map (isolates the scan wrapper)."""
        @jax.jit
        def step(kp, vp, *rest_args):
            kernel = lax.complex(kp[..., 0], kp[..., 1])
            vis = lax.complex(vp[..., 0], vp[..., 1])
            args = tuple(a[0] for a in (kernel, vis) + tuple(rest_args))
            return one(args)
        return step

    def one_grid0(args):
        """grid_chunks_dense_impl directly on slice 0 (no slice map)."""
        kern_c, vis_c, t, ps, mw, uv, sub, wpl, anc, val, wts = args
        ext = mxu_gridder.dense_pad_size(N, cfg.rv)
        nc = jnp.sum(jnp.any(val[0], axis=-1).astype(jnp.int32))
        gpad = jnp.zeros((cfg.num_pols, ext, ext), vis_c.dtype)
        gpad = mxu_gridder.grid_chunks_dense_impl(
            gpad, kern_c, None, uv[0], sub[0], wpl[0], vis_c[0], anc[0],
            val[0], None, nc, pixels=N, ts=cfg.rv,
            assembly=mxu_gridder.default_assembly())
        return jnp.sum(jnp.abs(gpad[:, ::64, ::64]))

    def unrolled(one):
        """Python-unrolled channel loop inside one jit (no lax.map)."""
        @jax.jit
        def step(kp, vp, *rest_args):
            kernel = lax.complex(kp[..., 0], kp[..., 1])
            vis = lax.complex(vp[..., 0], vp[..., 1])
            alls = (kernel, vis) + tuple(rest_args)
            tot = jnp.zeros((), jnp.float32)
            for c in range(num_channels):
                tot = tot + one(tuple(a[c] for a in alls))
            return tot
        return step

    variants = {
        "plumb": one_plumb,
        "grid": one_grid,
        "g2i": one_g2i,
        "full": one_full,
        "cheapck": one_cheapck,
    }
    singles = {
        "grid1": one_grid,      # 1 channel via lax.map-free single()
        "grid0": one_grid0,     # 1 channel, no slice map either
    }
    unrolleds = {
        "gridun": one_grid,     # all channels, Python-unrolled in one jit
        "fullun": one_full,
    }
    names = [a for a in sys.argv[1:]
             if a in variants or a in singles or a in unrolleds] \
        or list(variants)

    for name in names:
        if name in singles:
            step = single(singles[name])
        elif name in unrolleds:
            step = unrolled(unrolleds[name])
        else:
            step = batched(variants[name])
        # Single-channel variants process only channel 0; scale the work
        # accounting so GGAPS and ms/chan stay comparable across variants.
        eff_channels = 1 if name in singles else num_channels
        eff_vis = num_vis * eff_channels // num_channels
        v = float(step(kern_p, vis_p, *rest))  # compile + warmup
        iters = 3
        t0 = time.perf_counter()
        vals = [step(kern_p, vis_p, *rest) for _ in range(iters)]
        for x in vals:
            float(x)
        dt = (time.perf_counter() - t0) / iters
        ggaps = eff_vis * cfg.kernel_width ** 2 * cfg.num_pols / dt / 1e9
        print(f"{name:10s} {dt * 1e3:8.1f} ms  "
              f"{dt / eff_channels * 1e3:6.1f} ms/chan  "
              f"{ggaps:6.1f} GGAPS  checksum={v:.4g}", flush=True)


if __name__ == "__main__":
    main()
