"""Decompose direct-predict cost on the TPU (VERDICT r2 item 4).

Variants isolate the three stages of ops/predict.py plus two candidate
restructures:

- ``phase``   : (B,3)@(3,S) phase matmul only (checksum of phase)
- ``trig``    : + cos/sin on the (B,S) phase matrix
- ``full``    : the shipped predict_subtract path
- ``wplane``  : the (B,S)@(S,W) matmul + take_along_axis restructure
                (w-phase folded into per-plane flux columns, trig only on
                the 2-term uv phase)
- ``table``   : trig-free UV phases.  Model components live on the image
                pixel grid and UV is subgrid-quantized, so
                u*l = (2*uq+1)*x / (2*N*O) EXACTLY — the phase is one of
                2*N*O = 65536 roots of unity.  Integer (B,S) index math +
                two VMEM table gathers replace cos/sin entirely; the
                w-phase uses the wplane column trick.
- ``highprec``: full, with HIGH instead of HIGHEST matmul precision

Usage: python benchmarks/predict_tpu.py [variant ...]
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

from katsdpimager_tpu.ops import predict  # noqa: E402

N_VIS = 1 << 20
N_SRC = 256
W_PLANES = 32
P = 1
BLOCK = 8192
OVERSAMPLE = 8


PIXELS = 4096
#: pixel_size * uv_scale * PIXELS * OVERSAMPLE == 1 (gridding identity)
UV_SCALE = 1e-4
PIXEL_SIZE = 1.0 / (PIXELS * OVERSAMPLE * UV_SCALE)


def make_inputs():
    rng = np.random.default_rng(0)
    # sources on the image pixel grid (how extract_sky_image builds them)
    xs = rng.integers(-PIXELS // 4, PIXELS // 4, N_SRC)
    ys = rng.integers(-PIXELS // 4, PIXELS // 4, N_SRC)
    l = xs * PIXEL_SIZE
    m = ys * PIXEL_SIZE
    n1 = np.sqrt(np.maximum(1.0 - l * l - m * m, 0.0)) - 1.0
    lmn = np.stack([l, m, n1], -1).astype(np.float32)
    flux = rng.uniform(0.1, 1.0, (N_SRC, P)).astype(np.float32)
    uv = rng.integers(-2000, 2000, (N_VIS, 2)).astype(np.int16)
    sub = rng.integers(0, OVERSAMPLE, (N_VIS, 2)).astype(np.int16)
    wp = np.sort(rng.integers(0, W_PLANES, N_VIS)).astype(np.int16)
    visr = rng.normal(size=(N_VIS, P)).astype(np.float32)
    visi = rng.normal(size=(N_VIS, P)).astype(np.float32)
    wts = np.ones((N_VIS, P), np.float32)
    return lmn, flux, uv, sub, wp, visr, visi, wts, xs, ys


def bench(fn, args, iters=8):
    r = fn(*args)
    jax.tree_util.tree_map(lambda x: None, r)
    s = float(jnp.sum(jnp.abs(r)) if hasattr(r, "dtype") else r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    s = float(jnp.sum(jnp.abs(r)) if hasattr(r, "dtype") else r)
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, s


def main():
    variants = sys.argv[1:] or ["phase", "trig", "full", "wplane",
                                "table"]
    lmn, flux, uv, sub, wp, visr, visi, wts, xs, ys = make_inputs()
    uv_scale, w_scale, w_bias = UV_SCALE, 5.0, -80.0
    xs_j = jnp.asarray(xs.astype(np.int32))
    ys_j = jnp.asarray(ys.astype(np.int32))

    lmn_j = jnp.asarray(lmn)
    flux_j = jnp.asarray(flux)
    uv_j, sub_j, wp_j = jnp.asarray(uv), jnp.asarray(sub), jnp.asarray(wp)
    visr_j, visi_j, wts_j = (jnp.asarray(visr), jnp.asarray(visi),
                             jnp.asarray(wts))

    def dequant(uvq, subq, wpq):
        u = (uvq[:, 0].astype(jnp.float32) * OVERSAMPLE
             + subq[:, 0].astype(jnp.float32) + 0.5) * uv_scale
        v = (uvq[:, 1].astype(jnp.float32) * OVERSAMPLE
             + subq[:, 1].astype(jnp.float32) + 0.5) * uv_scale
        w = wpq.astype(jnp.float32) * w_scale + w_bias
        return u, v, w

    hp = jax.lax.Precision.HIGHEST

    @jax.jit
    def phase_only(uvq, subq, wpq):
        u, v, w = dequant(uvq, subq, wpq)
        uvw = jnp.stack([u, v, w], -1)

        def blk(uvw_b):
            ph = (-2 * jnp.pi) * jnp.matmul(uvw_b, lmn_j.T, precision=hp)
            return jnp.sum(ph, axis=-1)

        nb = N_VIS // BLOCK
        out = jax.lax.map(blk, uvw.reshape(nb, BLOCK, 3))
        return jnp.sum(jnp.abs(out))

    @jax.jit
    def trig_only(uvq, subq, wpq):
        u, v, w = dequant(uvq, subq, wpq)
        uvw = jnp.stack([u, v, w], -1)

        def blk(uvw_b):
            ph = (-2 * jnp.pi) * jnp.matmul(uvw_b, lmn_j.T, precision=hp)
            return jnp.sum(jnp.cos(ph) - jnp.sin(ph), axis=-1)

        nb = N_VIS // BLOCK
        out = jax.lax.map(blk, uvw.reshape(nb, BLOCK, 3))
        return jnp.sum(jnp.abs(out))

    def full_fn(precision):
        @jax.jit
        def f(uvq, subq, wpq, vr, vi, w8):
            vis = (vr + 1j * vi).astype(jnp.complex64)
            out = predict.predict_subtract(
                lmn_j, flux_j, uvq, subq, wpq, vis, w8,
                uv_scale, w_scale, w_bias, oversample=OVERSAMPLE,
                block=BLOCK)
            return jnp.sum(jnp.abs(out.real)) + jnp.sum(jnp.abs(out.imag))
        return f

    @jax.jit
    def wplane_fn(uvq, subq, wpq, vr, vi, w8):
        vis = (vr + 1j * vi).astype(jnp.complex64)
        u, v, _ = dequant(uvq, subq, wpq)
        # per-plane flux columns: F[p, s] = flux_s * exp(-2i pi w_p n1_s)
        wvals = (jnp.arange(W_PLANES, dtype=jnp.float32) * w_scale + w_bias)
        wphase = (-2 * jnp.pi) * wvals[:, None] * lmn_j[None, :, 2]
        fw_re = jnp.cos(wphase) * flux_j[:, 0][None, :]   # (W, S)
        fw_im = jnp.sin(wphase) * flux_j[:, 0][None, :]

        def blk(args):
            u_b, v_b, wp_b, vis_b, wts_b = args
            uvm = jnp.stack([u_b, v_b], -1)
            ph = (-2 * jnp.pi) * jnp.matmul(uvm, lmn_j[:, :2].T,
                                            precision=hp)
            c, s = jnp.cos(ph), jnp.sin(ph)
            # (B,S)@(S,W) on the MXU; select each row's w-plane column
            re = (jnp.matmul(c, fw_re.T, precision=hp)
                  - jnp.matmul(s, fw_im.T, precision=hp))
            im = (jnp.matmul(s, fw_re.T, precision=hp)
                  + jnp.matmul(c, fw_im.T, precision=hp))
            idx = wp_b.astype(jnp.int32)[:, None]
            pre = (jnp.take_along_axis(re, idx, axis=1)
                   + 1j * jnp.take_along_axis(im, idx, axis=1))
            return vis_b - wts_b * pre.astype(vis_b.dtype)

        nb = N_VIS // BLOCK
        out = jax.lax.map(blk, (u.reshape(nb, BLOCK), v.reshape(nb, BLOCK),
                                wpq.reshape(nb, BLOCK),
                                vis.reshape(nb, BLOCK, P),
                                w8.reshape(nb, BLOCK, P)))
        return jnp.sum(jnp.abs(out.real)) + jnp.sum(jnp.abs(out.imag))

    M = 2 * PIXELS * OVERSAMPLE      # 65536 roots of unity
    ang = -2.0 * np.pi * np.arange(M) / M
    tab_re = jnp.asarray(np.cos(ang).astype(np.float32))
    tab_im = jnp.asarray(np.sin(ang).astype(np.float32))

    @jax.jit
    def table_fn(uvq, subq, wpq, vr, vi, w8):
        vis = (vr + 1j * vi).astype(jnp.complex64)
        # per-plane flux columns as in wplane_fn
        wvals = (jnp.arange(W_PLANES, dtype=jnp.float32) * w_scale + w_bias)
        wphase = (-2 * jnp.pi) * wvals[:, None] * lmn_j[None, :, 2]
        fw_re = jnp.cos(wphase) * flux_j[:, 0][None, :]
        fw_im = jnp.sin(wphase) * flux_j[:, 0][None, :]
        # integer phase factors: phase_uv = 2*pi*k/M with
        # k = ((2*uq+1)*x + (2*vq+1)*y) mod M, exact in int32
        au = ((2 * (uvq[:, 0].astype(jnp.int32) * OVERSAMPLE
                    + subq[:, 0].astype(jnp.int32)) + 1) % M)
        av = ((2 * (uvq[:, 1].astype(jnp.int32) * OVERSAMPLE
                    + subq[:, 1].astype(jnp.int32)) + 1) % M)
        xm = xs_j % M
        ym = ys_j % M

        def blk(args):
            au_b, av_b, wp_b, vis_b, wts_b = args
            k = (au_b[:, None] * xm[None, :]
                 + av_b[:, None] * ym[None, :]) & (M - 1)
            c = jnp.take(tab_re, k, axis=0)
            s = jnp.take(tab_im, k, axis=0)
            re = (jnp.matmul(c, fw_re.T, precision=hp)
                  - jnp.matmul(s, fw_im.T, precision=hp))
            im = (jnp.matmul(s, fw_re.T, precision=hp)
                  + jnp.matmul(c, fw_im.T, precision=hp))
            idx = wp_b.astype(jnp.int32)[:, None]
            pre = (jnp.take_along_axis(re, idx, axis=1)
                   + 1j * jnp.take_along_axis(im, idx, axis=1))
            return vis_b - wts_b * pre.astype(vis_b.dtype)

        nb = N_VIS // BLOCK
        out = jax.lax.map(blk, (au.reshape(nb, BLOCK),
                                av.reshape(nb, BLOCK),
                                wpq.reshape(nb, BLOCK),
                                vis.reshape(nb, BLOCK, P),
                                w8.reshape(nb, BLOCK, P)))
        return jnp.sum(jnp.abs(out.real)) + jnp.sum(jnp.abs(out.imag))

    for v in variants:
        if v == "phase":
            ms, s = bench(phase_only, (uv_j, sub_j, wp_j))
        elif v == "trig":
            ms, s = bench(trig_only, (uv_j, sub_j, wp_j))
        elif v == "full":
            ms, s = bench(full_fn(hp), (uv_j, sub_j, wp_j, visr_j, visi_j,
                                        wts_j))
        elif v == "wplane":
            ms, s = bench(wplane_fn, (uv_j, sub_j, wp_j, visr_j, visi_j,
                                      wts_j))
        elif v == "table":
            ms, s = bench(table_fn, (uv_j, sub_j, wp_j, visr_j, visi_j,
                                     wts_j))
        elif v == "highprec":
            continue  # predict_subtract has fixed precision; placeholder
        else:
            print("unknown variant", v)
            continue
        mvis = N_VIS / (ms * 1e-3) / 1e6
        print(f"{v:10s} {ms:8.2f} ms  {mvis:8.2f} Mvis/s  checksum={s:.4g}")


if __name__ == "__main__":
    main()
