"""One-off TPU decomposition of the dense-gridder matmul assembly.

Times stage-stripped variants of the group pipeline at the K=60 / 4k-grid
/ 1M-vis design point to locate the bottleneck:

- ``gather``   : spectral row gathers + shift ramps only (checksum Su/Sv)
- ``core``     : + the (L,Mc)@(Mc,L) core einsum (checksum core)
- ``noscatter``: + G band transforms, bands summed into one (P,TS2,TS2)
                 accumulator (no tile scatter / colour combine)
- ``full``     : the shipped grid_chunks_dense path (tile scatter+combine)
- ``high``     : full, with precision=high matmuls (3-pass vs 6-pass f32)

Usage: python benchmarks/decomp_tpu.py [variant ...]
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from katsdpimager_tpu.ops import mxu_gridder  # noqa: E402

PIXELS = 4096
K = 60
TS = 64
MC = 256
GROUP = 128  # override per-variant with variant:group syntax
N_VIS = 1 << 20


def make_inputs():
    rng = np.random.default_rng(0)
    W, O = 8, 8
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


def staged(kp, vp, pj, *, stage: str, precision: str, group: int = GROUP):
    """Group loop over occupied chunks running only the stages <= `stage`."""
    kernel = lax.complex(kp[..., 0], kp[..., 1])
    vis = lax.complex(vp[..., 0], vp[..., 1])
    uvs, subs, wps, ancs, vals = pj
    NC = uvs.shape[0]
    TSK = TS + K
    TS2 = 2 * TS
    L = mxu_gridder._fft_pad_len(TSK)
    W, O = kernel.shape[0], kernel.shape[1]
    kernel_fft = jnp.fft.fft(
        jnp.pad(kernel, ((0, 0), (0, 0), (0, L - K))), axis=-1
    ).astype(kernel.dtype)
    kflat = kernel_fft.reshape(W * O, L)
    uv_bias = (K - 1) // 2 - PIXELS // 2
    tk = np.arange(L)
    G = jnp.asarray(np.exp(2j * np.pi * np.outer(tk, tk) / L)
                    .astype(np.complex64) / L)
    ramp_tab = jnp.asarray(np.exp(
        -2j * np.pi * np.outer(np.arange(TS2), tk) / L).astype(np.complex64))

    n_groups = NC // group
    uv_g = uvs.reshape(n_groups, group, MC, 2)
    sub_g = subs.reshape(n_groups, group, MC, 2)
    wp_g = wps.reshape(n_groups, group, MC)
    vis_g = vis.reshape(n_groups, group, MC, 1)
    anc_g = ancs.reshape(n_groups, group, 2)
    val_g = vals.reshape(n_groups, group, MC)
    n_chunks = mxu_gridder.occupied_chunks(vals)
    ng = jnp.minimum((n_chunks + group - 1) // group, n_groups)

    WO = W * O
    kflat_ri = jnp.concatenate([kflat.real, kflat.imag], axis=-1)  # (WO, 2L)
    ramp_ri = jnp.concatenate([ramp_tab.real, ramp_tab.imag], axis=-1)
    oh_prec = (lax.Precision.DEFAULT, lax.Precision.HIGHEST)

    def onehot_S(idx, off):
        """Su/Sv rows via one-hot matmuls instead of HBM gathers."""
        oh_spec = (idx[:, None] == jnp.arange(WO, dtype=idx.dtype)
                   ).astype(jnp.float32)
        oh_ramp = (off[:, None] == jnp.arange(TS2, dtype=off.dtype)
                   ).astype(jnp.float32)
        sp = jnp.dot(oh_spec, kflat_ri, precision=oh_prec)   # (Mc, 2L)
        rp = jnp.dot(oh_ramp, ramp_ri, precision=oh_prec)
        return (lax.complex(sp[:, :L], sp[:, L:])
                * lax.complex(rp[:, :L], rp[:, L:]))

    def one(uv_c, sub_c, wp_c, vis_c, anc_c, val_c):
        u0r = jnp.clip(uv_c[:, 0] - uv_bias - anc_c[1], 0, TS2 - 1)
        v0r = jnp.clip(uv_c[:, 1] - uv_bias - anc_c[0], 0, TS2 - 1)
        if stage.startswith("oh"):
            Su = onehot_S(wp_c * O + sub_c[:, 0], u0r)
            Sv = onehot_S(wp_c * O + sub_c[:, 1], v0r)
        else:
            spec_u = kflat[wp_c * O + sub_c[:, 0]]
            spec_v = kflat[wp_c * O + sub_c[:, 1]]
            Su = spec_u * ramp_tab[u0r]
            Sv = spec_v * ramp_tab[v0r]
        if stage in ("gather", "ohgather"):
            return jnp.sum(jnp.abs(Su)) + jnp.sum(jnp.abs(Sv))
        sample = vis_c.T * val_c[None, :]
        core = jnp.einsum("mk,pm,ml->pkl", Sv, jnp.conj(sample), Su,
                          precision=precision,
                          preferred_element_type=jnp.complex64)
        if stage in ("core", "ohcore"):
            return jnp.sum(jnp.abs(core))
        band = jnp.einsum("kr,pkl,lc->prc", G, core, G,
                          precision=precision,
                          preferred_element_type=jnp.complex64)
        return jnp.conj(band)

    if stage in ("gather", "core", "ohgather", "ohcore"):
        def body(i, acc):
            xsi = tuple(lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                        for a in (uv_g, sub_g, wp_g, vis_g, anc_g, val_g))
            return acc + jnp.sum(jax.vmap(one)(*xsi))

        return lax.fori_loop(0, ng, body, jnp.zeros((), jnp.float32))

    # noscatter: sum all bands into one window
    def body(i, acc):
        xsi = tuple(lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
                    for a in (uv_g, sub_g, wp_g, vis_g, anc_g, val_g))
        bands = jax.vmap(one)(*xsi)
        return acc + jnp.sum(bands, axis=0)

    acc = lax.fori_loop(0, ng, body, jnp.zeros((1, L, L), jnp.complex64))
    return jnp.sum(jnp.abs(acc))


def full(kp, vp, pj, *, precision: str, group: int = GROUP):
    old = mxu_gridder._PRECISION
    mxu_gridder._PRECISION = precision
    try:
        ext = mxu_gridder.dense_pad_size(PIXELS, TS)
        gpad = jnp.zeros((1, ext, ext), jnp.complex64)
        wg = jnp.ones((1, PIXELS, PIXELS), jnp.float32)
        dw = jnp.ones((pj[0].shape[0], MC, 1), jnp.float32)
        out = mxu_gridder.grid_chunks_dense_impl(
            gpad, lax.complex(kp[..., 0], kp[..., 1]), wg, pj[0], pj[1],
            pj[2], lax.complex(vp[..., 0], vp[..., 1]), pj[3], pj[4], dw,
            mxu_gridder.occupied_chunks(pj[4]),
            pixels=PIXELS, ts=TS, group=group, assembly="matmul")
        return jnp.sum(jnp.abs(out))
    finally:
        mxu_gridder._PRECISION = old


def main():
    variants = sys.argv[1:] or ["gather", "core", "noscatter", "full", "high"]
    kp, vp, pj = make_inputs()
    for spec in variants:
        v, _, g = spec.partition(":")
        g = int(g) if g else GROUP
        if v == "full":
            fn = jax.jit(lambda a, b, g=g: full(a, b, pj, precision="highest",
                                                group=g))
        elif v == "high":
            fn = jax.jit(lambda a, b, g=g: full(a, b, pj, precision="high",
                                                group=g))
        else:
            fn = jax.jit(lambda a, b, v=v, g=g: staged(a, b, pj, stage=v,
                                                       precision="highest",
                                                       group=g))
        float(fn(kp, vp))  # compile + warm
        iters = 3
        t0 = time.perf_counter()
        vals = [fn(kp, vp) for _ in range(iters)]
        for x in vals:
            float(x)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "variant": spec, "ms": round(dt * 1e3, 2),
            "ggaps": round(N_VIS * K * K / dt / 1e9, 1)}), flush=True)


if __name__ == "__main__":
    main()
