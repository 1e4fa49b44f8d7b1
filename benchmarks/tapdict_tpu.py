"""Decompose the shipped tapdict gridder on the TPU (round-3 push).

The driver bench spends ~28-30 ms/1M-vis in the tapdict gridder at the
4k/K=60 point — ~4% MXU utilisation and well above the ~7 ms HBM-traffic
model, so the stage shares decide the next move.  Variants:

- ``gather``  : the two taps_tab row gathers only (checksum)
- ``sample``  : + sample/US elementwise expansion (checksum of US)
- ``band``    : + the (TSK,Mc)@(Mc,TSK) band einsum, bands summed into one
                accumulator (no pad, no tile scatter)
- ``band128`` : same, with taps_tab rows zero-padded TSK->2*ts so the
                einsum is exactly (128,Mc)@(Mc,128) and the band needs no
                jnp.pad (lane-aligned gathers + MXU-native shapes)
- ``scatter`` : + the 4-colour tile scatter-add (= the full group loop)
- ``full``    : the shipped grid_chunks_dense_impl (tapdict assembly)

Usage: python benchmarks/tapdict_tpu.py [variant ...]
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

PIXELS = int(os.environ.get("TAPDICT_PIXELS", "4096"))
K = int(os.environ.get("TAPDICT_K", "60"))
TS = int(os.environ.get("TAPDICT_TS", "64"))
MC = int(os.environ.get("TAPDICT_MC", "256"))
GROUP = int(os.environ.get("TAPDICT_GROUP", "128"))
N_VIS = 1 << int(os.environ.get("TAPDICT_NVIS_LOG2", "20"))
W = int(os.environ.get("TAPDICT_W", "8"))
O = 8


def make_inputs():
    rng = np.random.default_rng(0)
    kernel = (rng.normal(size=(W, O, K))
              + 1j * rng.normal(size=(W, O, K))).astype(np.complex64)
    lim = PIXELS // 2 - K - 1
    uv = np.clip(rng.normal(scale=lim / 3, size=(N_VIS, 2)),
                 -lim, lim).astype(np.int16)
    sub = rng.integers(0, O, size=(N_VIS, 2)).astype(np.int16)
    wp = rng.integers(0, W, size=N_VIS).astype(np.int16)
    vis = (rng.normal(size=(N_VIS, 1))
           + 1j * rng.normal(size=(N_VIS, 1))).astype(np.complex64)
    plan = mxu_gridder.plan_chunks_tiled(
        uv, sub, wp, vis, np.ones((N_VIS, 1), np.float32),
        pixels=PIXELS, kernel_width=K, ts=TS, mc=MC)

    def pair(x):
        return jnp.asarray(np.stack([x.real, x.imag], -1).astype(np.float32))

    pj = [jnp.asarray(x) for x in (plan.uv, plan.sub_uv, plan.w_plane,
                                   plan.anchor, plan.valid)]
    return pair(kernel), pair(plan.vis), pj


REPEAT = int(os.environ.get("TAPDICT_REPEAT", "1"))


def repeated(compute):
    """Run ``compute(scale)`` REPEAT times with a carry-dependent scale so
    XLA cannot hoist the body; the t(R) slope is the floor-free cost (the
    tunnel dispatch floor OVERLAPS compute, so single-call subtraction
    lies)."""
    if REPEAT == 1:
        return compute(1.0)

    def body(i, acc):
        return acc + compute(1.0 + 1e-30 * acc)

    return lax.fori_loop(0, REPEAT, body, jnp.zeros((), jnp.float32))


def staged(kp, vp, pj, *, stage: str, group: int = GROUP,
           scale=1.0):
    # NOTE: scale defaults to a plain Python float — a jnp default would
    # materialize a device array at import time, committing the backend
    # (the axon tunnel) before main() runs.
    kernel = lax.complex(kp[..., 0], kp[..., 1]) * scale
    vis = lax.complex(vp[..., 0], vp[..., 1])
    uvs, subs, wps, ancs, vals = pj
    NC = uvs.shape[0]
    TSK = TS + K
    TS2 = 2 * TS
    width = TS2 if stage == "band128" else TSK
    uv_bias = (K - 1) // 2 - PIXELS // 2

    kr = kernel.reshape(W * O, K)
    rel = np.arange(width)[None, :] - np.arange(TS)[:, None]
    mask_np = (rel >= 0) & (rel < K)
    relc = np.clip(rel, 0, K - 1)
    taps_tab = jnp.where(
        jnp.asarray(mask_np)[None], kr[:, jnp.asarray(relc)], 0
    ).reshape(W * O * TS, width)

    # Small UNSHIFTED table for the gather-free assembly variants: one
    # row per (w_plane, subpixel), kernel taps at lane offset 0, padded
    # to the band width.  W*O rows x width — TS-times smaller than
    # taps_tab.
    small_tab = jnp.pad(kr, ((0, 0), (0, width - K)))
    shift_bits = max(1, (TS - 1).bit_length())

    def select_shift(rows_idx, shifts):
        """Factor rows via one-hot MXU selection from small_tab, then a
        per-row lane shift by binary roll/select stages (no HBM gather)."""
        onehot = (rows_idx[:, None]
                  == jnp.arange(W * O)[None, :]).astype(jnp.float32)
        xr = jnp.matmul(onehot, small_tab.real, precision=prec)
        xi = jnp.matmul(onehot, small_tab.imag, precision=prec)
        x = jax.lax.complex(xr, xi)
        for b in range(shift_bits):
            step = 1 << b
            take = ((shifts >> b) & 1).astype(bool)[:, None]
            x = jnp.where(take, jnp.roll(x, step, axis=-1), x)
        cols = jnp.arange(width)[None, :]
        return jnp.where(cols >= shifts[:, None], x, 0)

    n_groups = NC // group
    uv_g = uvs.reshape(n_groups, group, MC, 2)
    sub_g = subs.reshape(n_groups, group, MC, 2)
    wp_g = wps.reshape(n_groups, group, MC)
    vis_g = vis.reshape(n_groups, group, MC, 1)
    anc_g = ancs.reshape(n_groups, group, 2)
    val_g = vals.reshape(n_groups, group, MC)
    n_chunks = mxu_gridder.occupied_chunks(vals)
    ng = jnp.minimum((n_chunks + group - 1) // group, n_groups)

    prec = jax.lax.Precision.HIGHEST

    def one(uv_c, sub_c, wp_c, vis_c, anc_c, val_c):
        u0r = jnp.clip(uv_c[:, 0] - uv_bias - anc_c[1], 0, TS - 1)
        v0r = jnp.clip(uv_c[:, 1] - uv_bias - anc_c[0], 0, TS - 1)
        if stage in ("bandss", "scatterss"):
            Utap = select_shift(wp_c * O + sub_c[:, 0], u0r)
            Vt = select_shift(wp_c * O + sub_c[:, 1], v0r)
        else:
            Utap = taps_tab[(wp_c * O + sub_c[:, 0]) * TS + u0r]
            Vt = taps_tab[(wp_c * O + sub_c[:, 1]) * TS + v0r]
        if stage == "gather":
            return jnp.sum(jnp.abs(Utap.real)) + jnp.sum(jnp.abs(Vt.real))
        sample = vis_c.T * val_c[None, :]
        if stage in ("bandv", "scatterv"):
            # scale folded into the V factor: no US intermediate
            VS = jnp.conj(Vt) * sample[0][:, None]          # (Mc, width)
            band = jnp.einsum("mr,mc->rc", VS, jnp.conj(Utap),
                              precision=prec,
                              preferred_element_type=jnp.complex64)
            return band[None]
        US = sample[:, :, None] * jnp.conj(Utap)[None, :, :]
        if stage == "sample":
            return jnp.sum(jnp.abs(US.real))
        V = jnp.conj(Vt).T
        band = jnp.einsum("rm,pmc->prc", V, US, precision=prec,
                          preferred_element_type=jnp.complex64)
        return band

    if stage in ("gather", "sample"):
        def body(i, acc):
            xsi = tuple(lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                        for a in (uv_g, sub_g, wp_g, vis_g, anc_g, val_g))
            return acc + jnp.sum(jax.vmap(one)(*xsi))

        return lax.fori_loop(0, ng, body, jnp.zeros((), jnp.float32))

    if stage in ("band", "band128", "bandv", "bandss"):
        def body(i, acc):
            xsi = tuple(lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                        for a in (uv_g, sub_g, wp_g, vis_g, anc_g, val_g))
            bands = jax.vmap(one)(*xsi)
            return acc + jnp.sum(bands, axis=0)

        acc = lax.fori_loop(0, ng, body,
                            jnp.zeros((1, width, width), jnp.complex64))
        return jnp.sum(jnp.abs(acc))

    # scatter: full group loop incl. the 4-colour tile accumulator
    ntv = -(-PIXELS // TS) + 1
    nt2 = -(-ntv // 2) + 1

    def body(i, T):
        xsi = tuple(lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                    for a in (uv_g, sub_g, wp_g, vis_g, anc_g, val_g))
        bands = jax.vmap(one)(*xsi)
        bands = jnp.pad(bands, ((0, 0), (0, 0), (0, TS2 - TSK),
                                (0, TS2 - TSK)))
        anc = xsi[4]
        tv = anc[:, 0] // TS
        tu = anc[:, 1] // TS
        return T.at[tv & 1, tu & 1, tv >> 1, tu >> 1].add(bands)

    T0 = jnp.zeros((2, 2, nt2, nt2, 1, TS2, TS2), jnp.complex64)
    T = lax.fori_loop(0, ng, body, T0)
    return jnp.sum(jnp.abs(T.real))


def full(kp, vp, pj, scale=1.0):
    ext = mxu_gridder.dense_pad_size(PIXELS, TS)
    gpad = jnp.zeros((1, ext, ext), jnp.complex64)
    out = mxu_gridder.grid_chunks_dense_impl(
        gpad, lax.complex(kp[..., 0], kp[..., 1]) * scale, None, pj[0],
        pj[1],
        pj[2], lax.complex(vp[..., 0], vp[..., 1]), pj[3], pj[4], None,
        mxu_gridder.occupied_chunks(pj[4]),
        pixels=PIXELS, ts=TS, group=GROUP, assembly="tapdict")
    return jnp.sum(jnp.abs(out))


def fullq(kp, vp, pj, scale=1.0):
    """Redesign candidate: 128-wide taps (no band pad), stacked-real
    single dot per chunk, quadrant scatter into a compact (ntq, ntq, ts,
    2*ts) re|im tile accumulator, one reshape combine (no 4-colour
    overlap-add)."""
    kernel = lax.complex(kp[..., 0], kp[..., 1]) * scale
    vis = lax.complex(vp[..., 0], vp[..., 1])
    uvs, subs, wps, ancs, vals = pj
    NC = uvs.shape[0]
    TS2 = 2 * TS
    uv_bias = (K - 1) // 2 - PIXELS // 2

    kr = kernel.reshape(W * O, K)
    rel = np.arange(TS2)[None, :] - np.arange(TS)[:, None]
    mask_np = (rel >= 0) & (rel < K)
    relc = np.clip(rel, 0, K - 1)
    taps_tab = jnp.where(
        jnp.asarray(mask_np)[None], kr[:, jnp.asarray(relc)], 0
    ).reshape(W * O * TS, TS2)
    taps_r = taps_tab.real
    taps_i = taps_tab.imag

    group = GROUP
    n_groups = NC // group
    uv_g = uvs.reshape(n_groups, group, MC, 2)
    sub_g = subs.reshape(n_groups, group, MC, 2)
    wp_g = wps.reshape(n_groups, group, MC)
    vis_g = vis.reshape(n_groups, group, MC, 1)
    anc_g = ancs.reshape(n_groups, group, 2)
    val_g = vals.reshape(n_groups, group, MC)
    n_chunks = mxu_gridder.occupied_chunks(pj[4])
    ng = jnp.minimum((n_chunks + group - 1) // group, n_groups)

    prec = jax.lax.Precision.HIGHEST
    # Accumulator must cover every tile the layout can anchor a chunk at:
    # size it from the dense pad extent, not the clipped-input heuristic
    # (OOB scatter updates are silently dropped by JAX).
    ntq = mxu_gridder.dense_pad_size(PIXELS, TS) // TS

    def one(uv_c, sub_c, wp_c, vis_c, anc_c, val_c):
        u0r = jnp.clip(uv_c[:, 0] - uv_bias - anc_c[1], 0, TS - 1)
        v0r = jnp.clip(uv_c[:, 1] - uv_bias - anc_c[0], 0, TS - 1)
        iu = (wp_c * O + sub_c[:, 0]) * TS + u0r
        iv = (wp_c * O + sub_c[:, 1]) * TS + v0r
        Ur = taps_r[iu]
        Ui = taps_i[iu]
        Vr = taps_r[iv]
        Vi = taps_i[iv]
        s = vis_c[:, 0] * val_c                      # (Mc,) complex
        sr, si = s.real, s.imag
        # VS = conj(V) * s
        VSr = Vr * sr[:, None] + Vi * si[:, None]
        VSi = Vr * si[:, None] - Vi * sr[:, None]
        A = jnp.concatenate([VSr, VSi], axis=1)      # (Mc, 2*TS2)
        B = jnp.concatenate([Ur, Ui], axis=1)        # (Mc, 2*TS2)
        # band = VS^T @ conj(U): re = P00+P11, im = P10-P01
        Pm = lax.dot_general(A, B, (((0,), (0,)), ((), ())),
                             precision=prec,
                             preferred_element_type=jnp.float32)
        re = Pm[:TS2, :TS2] + Pm[TS2:, TS2:]
        im = Pm[TS2:, :TS2] - Pm[:TS2, TS2:]
        return re, im

    def body(i, T):
        xsi = tuple(lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                    for a in (uv_g, sub_g, wp_g, vis_g, anc_g, val_g))
        re, im = jax.vmap(one)(*xsi)                 # (G, TS2, TS2)
        anc = xsi[4]
        tv = anc[:, 0] // TS
        tu = anc[:, 1] // TS
        for dy in range(2):
            for dx in range(2):
                blk = jnp.concatenate(
                    [re[:, dy * TS:(dy + 1) * TS, dx * TS:(dx + 1) * TS],
                     im[:, dy * TS:(dy + 1) * TS, dx * TS:(dx + 1) * TS]],
                    axis=-1)                         # (G, TS, 2*TS)
                T = T.at[tv + dy, tu + dx].add(blk)
        return T

    T0 = jnp.zeros((ntq, ntq, TS, TS2), jnp.float32)
    T = lax.fori_loop(0, ng, body, T0)
    ext2 = ntq * TS
    gre = T[..., :TS].transpose(0, 2, 1, 3).reshape(ext2, ext2)
    gim = T[..., TS:].transpose(0, 2, 1, 3).reshape(ext2, ext2)
    ext = mxu_gridder.dense_pad_size(PIXELS, TS)
    g = jnp.zeros((1, ext, ext), jnp.complex64)
    g = g.at[0, :ext2, :ext2].add(lax.complex(gre, gim))
    return jnp.sum(jnp.abs(g))


def main():
    variants = sys.argv[1:] or ["gather", "sample", "band", "band128",
                                "bandss", "scatterss", "scatter", "full"]
    kp, vp, pj = make_inputs()
    n_occ = int(np.asarray(mxu_gridder.occupied_chunks(pj[4])))
    for v in variants:
        if v == "fullarg":
            # plan as traced jit ARGUMENTS (how the production step sees
            # it) instead of closed-over constants
            fn2 = jax.jit(lambda a, b, *p: repeated(
                lambda s: full(a, b, list(p), scale=s)))
            fn = lambda a, b: fn2(a, b, *pj)  # noqa: E731
        elif v == "fullq":
            fn = jax.jit(lambda a, b: repeated(
                lambda s: fullq(a, b, pj, scale=s)))
        elif v == "full":
            fn = jax.jit(lambda a, b: repeated(
                lambda s: full(a, b, pj, scale=s)))
        else:
            fn = jax.jit(lambda a, b, v=v: repeated(
                lambda s: staged(a, b, pj, stage=v, scale=s)))
        cks = float(fn(kp, vp))  # compile + warm
        iters = 5
        t0 = time.perf_counter()
        vals = [fn(kp, vp) for _ in range(iters)]
        for x in vals:
            float(x)
        dt = (time.perf_counter() - t0) / iters
        # dt covers REPEAT inner repeats; scale the work accounting and
        # normalize the (summed) checksum so JSON lines are comparable
        # across TAPDICT_REPEAT settings.
        ggaps = N_VIS * K * K * REPEAT / dt / 1e9
        print(json.dumps({"variant": v, "ms": round(dt * 1e3, 2),
                          "ms_per_repeat": round(dt * 1e3 / REPEAT, 2),
                          "ggaps": round(ggaps, 1),
                          "repeat": REPEAT,
                          "occupied_chunks": n_occ,
                          "checksum": cks / REPEAT}))


if __name__ == "__main__":
    main()
