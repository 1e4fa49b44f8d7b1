"""Fused Pallas gridder vs the XLA dense path and the scatter oracle
(interpret mode on CPU; the identical kernel compiles for TPU — the
Mosaic feature set it needs was hardware-probed in round 4)."""

import numpy as np
import jax.numpy as jnp

from katsdpimager_tpu.ops import gridder, mxu_gridder, pallas_gridder


def make_case(rng, pixels=512, K=16, oversample=8, w_planes=4, n=2000,
              num_pols=1):
    kernel = (rng.normal(size=(w_planes, oversample, K))
              + 1j * rng.normal(size=(w_planes, oversample, K))
              ).astype(np.complex64)
    lim = pixels // 2 - K - 1
    uv = np.clip(rng.normal(scale=lim / 3, size=(n, 2)), -lim, lim
                 ).astype(np.int16)
    sub = rng.integers(0, oversample, size=(n, 2)).astype(np.int16)
    wp = rng.integers(0, w_planes, size=n).astype(np.int16)
    vis = (rng.normal(size=(n, num_pols))
           + 1j * rng.normal(size=(n, num_pols))).astype(np.complex64)
    wg = rng.uniform(0.5, 2.0, size=(num_pols, pixels, pixels)
                     ).astype(np.float32)
    return kernel, uv, sub, wp, vis, wg


def run_pair(rng, *, pixels=512, K=16, num_pols=1, n=2000, ts=64,
             weights_grid=True, use_n_chunks=True, w_planes=4):
    """Run the XLA tapless dense path and the fused Pallas path on the
    same plan; return (xla, pallas) padded grids."""
    kernel, uv, sub, wp, vis, wg = make_case(
        rng, pixels=pixels, K=K, n=n, num_pols=num_pols,
        w_planes=w_planes)
    plan = mxu_gridder.plan_chunks_tiled(
        uv, sub, wp, vis, np.ones_like(vis, np.float32), pixels=pixels,
        kernel_width=K, ts=ts, mc=128)
    ext = mxu_gridder.dense_pad_size(pixels, ts)
    gpad0 = jnp.zeros((num_pols, ext, ext), jnp.complex64)
    wg_j = jnp.asarray(wg) if weights_grid else None
    nc = mxu_gridder.occupied_chunks(jnp.asarray(plan.valid)) \
        if use_n_chunks else None
    args = (jnp.asarray(kernel), wg_j,
            jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
            jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
            jnp.asarray(plan.anchor), jnp.asarray(plan.valid),
            None, nc)
    expected = np.asarray(mxu_gridder.grid_chunks_dense_impl(
        gpad0, *args, pixels=pixels, ts=ts, assembly="fft"))
    out = np.asarray(mxu_gridder.grid_chunks_dense_impl(
        gpad0, *args, pixels=pixels, ts=ts, assembly="pallas"))
    return expected, out, (kernel, uv, sub, wp, vis, wg, plan)


def test_matches_xla_dense():
    expected, out, _ = run_pair(np.random.default_rng(55))
    scale = np.max(np.abs(expected))
    np.testing.assert_allclose(out, expected, atol=2e-5 * scale)


def test_matches_xla_dense_natural_no_bound():
    """Natural weighting (no density grid) and no occupied-chunk bound."""
    expected, out, _ = run_pair(np.random.default_rng(7),
                                weights_grid=False, use_n_chunks=False)
    scale = np.max(np.abs(expected))
    np.testing.assert_allclose(out, expected, atol=2e-5 * scale)


def test_matches_xla_dense_multi_pol():
    expected, out, _ = run_pair(np.random.default_rng(11), num_pols=4,
                                n=900)
    scale = np.max(np.abs(expected))
    np.testing.assert_allclose(out, expected, atol=2e-5 * scale)


def test_matches_scatter_oracle():
    rng = np.random.default_rng(77)
    expected_pad, out, (kernel, uv, sub, wp, vis, wg, _plan) = run_pair(
        rng, n=800)
    pixels = wg.shape[-1]
    oracle = gridder.grid_vis_reference(
        np.zeros((1, pixels, pixels), np.complex64), kernel, wg,
        uv, sub, wp, vis)
    got = out[:, :pixels, :pixels]
    scale = np.max(np.abs(oracle))
    np.testing.assert_allclose(got, oracle, atol=2e-4 * scale)


def test_pol_split_matches_joint(monkeypatch):
    """The per-pol accumulator split (taken when the joint colour planes
    exceed KTPU_PALLAS_MAX_ACC_GB) matches the joint fused path to f32
    rounding."""
    rng = np.random.default_rng(23)
    _, joint, (kernel, uv, sub, wp, vis, wg, plan) = run_pair(
        rng, num_pols=4, n=900)
    monkeypatch.setenv("KTPU_PALLAS_MAX_ACC_GB", "0.0001")
    _, split, _ = run_pair(np.random.default_rng(23), num_pols=4, n=900)
    scale = np.max(np.abs(joint))
    np.testing.assert_allclose(split, joint, atol=2e-6 * scale)


def test_kstack_band_matches_gauss(monkeypatch):
    """KTPU_PALLAS_BAND=kstack (contraction-stacked dots) is numerically
    interchangeable with the default Gauss 3-dot band."""
    rng = np.random.default_rng(29)
    _, gauss, _ = run_pair(rng, n=900)
    monkeypatch.setenv("KTPU_PALLAS_BAND", "kstack")
    _, kstack, _ = run_pair(np.random.default_rng(29), n=900)
    scale = np.max(np.abs(gauss))
    np.testing.assert_allclose(kstack, gauss, atol=2e-6 * scale)


def test_parts_combine_matches_complex():
    """grid_chunks_parts_impl (the fused Pallas combine -> cropped f32
    re/im planes) bit-matches the complex grid_chunks_dense_impl crop."""
    rng = np.random.default_rng(41)
    _, out, (kernel, uv, sub, wp, vis, wg, plan) = run_pair(rng, n=1200)
    pixels, ts = wg.shape[-1], 64
    nc = mxu_gridder.occupied_chunks(jnp.asarray(plan.valid))
    gr, gi = mxu_gridder.grid_chunks_parts_impl(
        jnp.asarray(kernel), jnp.asarray(wg),
        jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
        jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
        jnp.asarray(plan.anchor), jnp.asarray(plan.valid),
        None, nc, pixels=pixels, ts=ts, assembly="pallas")
    crop = np.asarray(out)[:, :pixels, :pixels]
    np.testing.assert_array_equal(np.asarray(gr), crop.real)
    np.testing.assert_array_equal(np.asarray(gi), crop.imag)


def test_parts_combine_multi_pol():
    rng = np.random.default_rng(43)
    _, out, (kernel, uv, sub, wp, vis, wg, plan) = run_pair(
        rng, num_pols=2, n=700)
    pixels, ts = wg.shape[-1], 64
    nc = mxu_gridder.occupied_chunks(jnp.asarray(plan.valid))
    gr, gi = mxu_gridder.grid_chunks_parts_impl(
        jnp.asarray(kernel), jnp.asarray(wg),
        jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
        jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
        jnp.asarray(plan.anchor), jnp.asarray(plan.valid),
        None, nc, pixels=pixels, ts=ts, assembly="pallas")
    crop = np.asarray(out)[:, :pixels, :pixels]
    np.testing.assert_array_equal(np.asarray(gr), crop.real)
    np.testing.assert_array_equal(np.asarray(gi), crop.imag)


def test_parts_pol_split_matches_joint(monkeypatch):
    """grid_chunks_parts_impl's per-pol accumulator split (8k IQUV
    path) matches the joint parts call."""
    rng = np.random.default_rng(53)
    _, _, (kernel, uv, sub, wp, vis, wg, plan) = run_pair(
        rng, num_pols=4, n=700)
    pixels, ts = wg.shape[-1], 64
    nc = mxu_gridder.occupied_chunks(jnp.asarray(plan.valid))
    args = (jnp.asarray(kernel), jnp.asarray(wg),
            jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
            jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
            jnp.asarray(plan.anchor), jnp.asarray(plan.valid),
            None, nc)
    joint = mxu_gridder.grid_chunks_parts_impl(
        *args, pixels=pixels, ts=ts, assembly="pallas")
    monkeypatch.setenv("KTPU_PALLAS_MAX_ACC_GB", "0.0001")
    split = mxu_gridder.grid_chunks_parts_impl(
        *args, pixels=pixels, ts=ts, assembly="pallas")
    scale = max(float(np.max(np.abs(np.asarray(joint[0])))), 1e-9)
    for j, s in zip(joint, split):
        np.testing.assert_allclose(np.asarray(s), np.asarray(j),
                                   atol=2e-6 * scale)


def test_degrid_fused_parts_matches_complex():
    """degrid_chunks_fused with an f32 (gre, gim) pair equals the
    complex-grid call."""
    rng = np.random.default_rng(47)
    kernel, uv, sub, wp, vis, wg = make_case(rng, n=600)
    pixels, K, ts = 512, kernel.shape[-1], 64
    plan = mxu_gridder.plan_chunks_tiled(
        uv, sub, wp, vis, np.ones_like(vis, np.float32), pixels=pixels,
        kernel_width=K, ts=ts, mc=128)
    nc = mxu_gridder.occupied_chunks(jnp.asarray(plan.valid))
    grid = (rng.normal(size=(1, pixels, pixels))
            + 1j * rng.normal(size=(1, pixels, pixels))
            ).astype(np.complex64)
    args = (jnp.asarray(kernel), jnp.asarray(plan.uv),
            jnp.asarray(plan.sub_uv), jnp.asarray(plan.w_plane),
            jnp.asarray(plan.anchor), nc)
    a = pallas_gridder.degrid_chunks_fused(
        jnp.asarray(grid), *args, pixels=pixels, ts=ts)
    b = pallas_gridder.degrid_chunks_fused(
        (jnp.asarray(grid.real), jnp.asarray(grid.imag)), *args,
        pixels=pixels, ts=ts)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_empty_plan_is_zero():
    """All-padding layout (n_chunks=0) must leave the grid untouched."""
    rng = np.random.default_rng(3)
    kernel, uv, sub, wp, vis, wg = make_case(rng, n=50)
    pixels, K, ts = 512, kernel.shape[-1], 64
    plan = mxu_gridder.plan_chunks_tiled(
        uv, sub, wp, vis, np.ones_like(vis, np.float32), pixels=pixels,
        kernel_width=K, ts=ts, mc=128)
    ext = mxu_gridder.dense_pad_size(pixels, ts)
    gpad0 = jnp.zeros((1, ext, ext), jnp.complex64)
    out = mxu_gridder.grid_chunks_dense_impl(
        gpad0, jnp.asarray(kernel), None,
        jnp.asarray(plan.uv), jnp.asarray(plan.sub_uv),
        jnp.asarray(plan.w_plane), jnp.asarray(plan.vis),
        jnp.asarray(plan.anchor), jnp.asarray(plan.valid),
        None, jnp.asarray(0, jnp.int32),
        pixels=pixels, ts=ts, assembly="pallas")
    np.testing.assert_array_equal(np.asarray(out), 0)
