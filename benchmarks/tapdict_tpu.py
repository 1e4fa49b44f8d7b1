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

PIXELS = 4096
K = 60
TS = 64
MC = 256
GROUP = 128
N_VIS = 1 << 20
W, O = 8, 8


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


def staged(kp, vp, pj, *, stage: str, group: int = GROUP):
    kernel = lax.complex(kp[..., 0], kp[..., 1])
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
        Utap = taps_tab[(wp_c * O + sub_c[:, 0]) * TS + u0r]
        Vt = taps_tab[(wp_c * O + sub_c[:, 1]) * TS + v0r]
        if stage == "gather":
            return jnp.sum(jnp.abs(Utap.real)) + jnp.sum(jnp.abs(Vt.real))
        sample = vis_c.T * val_c[None, :]
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

    if stage in ("band", "band128"):
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


def full(kp, vp, pj):
    ext = mxu_gridder.dense_pad_size(PIXELS, TS)
    gpad = jnp.zeros((1, ext, ext), jnp.complex64)
    out = mxu_gridder.grid_chunks_dense_impl(
        gpad, lax.complex(kp[..., 0], kp[..., 1]), None, pj[0], pj[1],
        pj[2], lax.complex(vp[..., 0], vp[..., 1]), pj[3], pj[4], None,
        mxu_gridder.occupied_chunks(pj[4]),
        pixels=PIXELS, ts=TS, group=GROUP, assembly="tapdict")
    return jnp.sum(jnp.abs(out))


def main():
    variants = sys.argv[1:] or ["gather", "sample", "band", "band128",
                                "scatter", "full"]
    kp, vp, pj = make_inputs()
    n_occ = int(np.asarray(mxu_gridder.occupied_chunks(pj[4])))
    for v in variants:
        if v == "full":
            fn = jax.jit(lambda a, b: full(a, b, pj))
        else:
            fn = jax.jit(lambda a, b, v=v: staged(a, b, pj, stage=v))
        float(fn(kp, vp))  # compile + warm
        iters = 5
        t0 = time.perf_counter()
        vals = [fn(kp, vp) for _ in range(iters)]
        for x in vals:
            float(x)
        dt = (time.perf_counter() - t0) / iters
        ggaps = N_VIS * K * K / dt / 1e9
        print(json.dumps({"variant": v, "ms": round(dt * 1e3, 2),
                          "ggaps": round(ggaps, 1),
                          "occupied_chunks": n_occ}))


if __name__ == "__main__":
    main()
