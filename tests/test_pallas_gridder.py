"""Pallas band-accumulate gridder vs the XLA chunked path (interpret mode
on CPU; same kernel compiles for TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from katsdpimager_tpu.ops import gridder, mxu_gridder, pallas_gridder


def make_case(rng, pixels=128, K=8, oversample=4, w_planes=3, n=300):
    kernel = (rng.normal(size=(w_planes, oversample, K))
              + 1j * rng.normal(size=(w_planes, oversample, K))
              ).astype(np.complex64)
    lim = pixels // 2 - K - 1
    uv = np.clip(rng.normal(scale=lim / 3, size=(n, 2)), -lim, lim
                 ).astype(np.int16)
    sub = rng.integers(0, oversample, size=(n, 2)).astype(np.int16)
    wp = rng.integers(0, w_planes, size=n).astype(np.int16)
    vis = (rng.normal(size=(n, 1)) + 1j * rng.normal(size=(n, 1))
           ).astype(np.complex64)
    wg = rng.uniform(0.5, 2.0, size=(1, pixels, pixels)).astype(np.float32)
    return kernel, uv, sub, wp, vis, wg


def test_matches_xla_path():
    rng = np.random.default_rng(55)
    kernel, uv, sub, wp, vis, wg = make_case(rng)
    pixels, K = wg.shape[-1], kernel.shape[-1]
    rv = ru = 32
    g = mxu_gridder.MxuGridder(pixels=pixels, kernel_width=K, num_pols=1,
                               rv=rv, ru=ru, mc=64)
    plan = g.plan(uv, sub, wp, vis, np.ones_like(vis, np.float32))

    args = (jnp.asarray(kernel), jnp.asarray(wg),
            jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
            jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
            jnp.asarray(plan.anchor), jnp.asarray(plan.valid))

    expected = np.asarray(mxu_gridder.grid_chunks(
        jnp.zeros((1, pixels + rv, pixels + ru), jnp.complex64),
        *args, pixels=pixels, rv=rv, ru=ru))
    out = np.asarray(pallas_gridder.grid_chunks_pallas(
        jnp.zeros((1, pixels + rv, pixels + ru), jnp.complex64),
        *args, pixels=pixels, rv=rv, ru=ru, interpret=True))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_matches_scatter_oracle():
    rng = np.random.default_rng(77)
    kernel, uv, sub, wp, vis, wg = make_case(rng, n=200)
    pixels, K = wg.shape[-1], kernel.shape[-1]
    rv = ru = 32

    expected = gridder.grid_vis_reference(
        np.zeros((1, pixels, pixels), np.complex64), kernel, wg,
        uv, sub, wp, vis)

    g = mxu_gridder.MxuGridder(pixels=pixels, kernel_width=K, num_pols=1,
                               rv=rv, ru=ru, mc=64)
    plan = g.plan(uv, sub, wp, vis, np.ones_like(vis, np.float32))
    gpad = jnp.zeros((1, pixels + rv, pixels + ru), jnp.complex64)
    out = pallas_gridder.grid_chunks_pallas(
        gpad, jnp.asarray(kernel), jnp.asarray(wg),
        jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
        jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
        jnp.asarray(plan.anchor), jnp.asarray(plan.valid),
        pixels=pixels, rv=rv, ru=ru, interpret=True)
    out = np.asarray(out)[:, :pixels, :pixels]
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_degrid_matches_xla_path():
    rng = np.random.default_rng(91)
    kernel, uv, sub, wp, vis, wg = make_case(rng, n=250)
    pixels, K = wg.shape[-1], kernel.shape[-1]
    rv = ru = 32
    g = mxu_gridder.MxuGridder(pixels=pixels, kernel_width=K, num_pols=1,
                               rv=rv, ru=ru, mc=64)
    weights = rng.uniform(0.2, 2.0, size=vis.shape).astype(np.float32)
    plan = g.plan(uv, sub, wp, vis, weights)
    model_grid = (rng.normal(size=(1, pixels, pixels))
                  + 1j * rng.normal(size=(1, pixels, pixels))
                  ).astype(np.complex64)
    gpad = jnp.pad(jnp.asarray(model_grid), ((0, 0), (0, rv), (0, ru)))

    expected = np.asarray(mxu_gridder.degrid_chunks(
        gpad, jnp.asarray(kernel),
        jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
        jnp.asarray(plan.w_plane), jnp.asarray(plan.weights),
        jnp.asarray(plan.vis), jnp.asarray(plan.anchor),
        jnp.asarray(plan.valid), pixels=pixels, rv=rv, ru=ru))
    out = np.asarray(pallas_gridder.degrid_chunks_pallas(
        gpad, jnp.asarray(kernel),
        jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
        jnp.asarray(plan.w_plane), jnp.asarray(plan.weights),
        jnp.asarray(plan.vis), jnp.asarray(plan.anchor),
        jnp.asarray(plan.valid), pixels=pixels, rv=rv, ru=ru,
        interpret=True))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_matches_xla_path_production_tile():
    """ts=64 geometry: column anchors alternate between 128-aligned and
    64-misaligned, exercising both branches of the aligned-window shift
    (the Mosaic-legal round-3 formulation)."""
    rng = np.random.default_rng(13)
    kernel, uv, sub, wp, vis, wg = make_case(rng, pixels=512, K=20, n=600)
    pixels, K = wg.shape[-1], kernel.shape[-1]
    rv = ru = 64
    g = mxu_gridder.MxuGridder(pixels=pixels, kernel_width=K, num_pols=1,
                               rv=rv, ru=ru, mc=64)
    plan = g.plan(uv, sub, wp, vis, np.ones_like(vis, np.float32))
    # both alignment branches must actually occur in the plan
    cols = np.asarray(plan.anchor)[np.asarray(plan.valid).any(axis=1), 1]
    assert (cols % 128 == 0).any() and (cols % 128 == 64).any()

    args = (jnp.asarray(kernel), jnp.asarray(wg),
            jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
            jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
            jnp.asarray(plan.anchor), jnp.asarray(plan.valid))
    expected = np.asarray(mxu_gridder.grid_chunks(
        jnp.zeros((1, pixels + rv, pixels + ru), jnp.complex64),
        *args, pixels=pixels, rv=rv, ru=ru))
    out = np.asarray(pallas_gridder.grid_chunks_pallas(
        jnp.zeros((1, pixels + rv, pixels + ru), jnp.complex64),
        *args, pixels=pixels, rv=rv, ru=ru, interpret=True))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)
