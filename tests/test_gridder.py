"""Gridder/degridder tests: XLA formulation vs the slow numpy oracle
(strategy mirrors reference test_grid.py:24-135)."""

import numpy as np
import jax.numpy as jnp

from katsdpimager_tpu.ops import gridder, wkernel


def random_case(rng, pixels=128, K=8, oversample=4, w_planes=3, pols=2, n=50):
    kernel = (rng.normal(size=(w_planes, oversample, K))
              + 1j * rng.normal(size=(w_planes, oversample, K))).astype(np.complex64)
    half = pixels // 2
    lim = half - K  # stay safely in range
    uv = rng.integers(-lim, lim, size=(n, 2)).astype(np.int16)
    sub_uv = rng.integers(0, oversample, size=(n, 2)).astype(np.int16)
    w_plane = rng.integers(0, w_planes, size=n).astype(np.int16)
    vis = (rng.normal(size=(n, pols)) + 1j * rng.normal(size=(n, pols))).astype(np.complex64)
    weights_grid = rng.uniform(0.5, 2.0, size=(pols, pixels, pixels)).astype(np.float32)
    return kernel, uv, sub_uv, w_plane, vis, weights_grid


class TestGrid:
    def test_matches_oracle(self):
        rng = np.random.default_rng(42)
        kernel, uv, sub_uv, w_plane, vis, wg = random_case(rng)
        pixels = wg.shape[-1]
        pols = vis.shape[1]

        expected = gridder.grid_vis_reference(
            np.zeros((pols, pixels, pixels), np.complex64),
            kernel, wg, uv, sub_uv, w_plane, vis)

        out = gridder.grid_vis(
            jnp.zeros((pols, pixels, pixels), jnp.complex64),
            jnp.asarray(kernel), jnp.asarray(wg), jnp.asarray(uv),
            jnp.asarray(sub_uv), jnp.asarray(w_plane), jnp.asarray(vis),
            pixels=pixels)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=1e-4)

    def test_padding_is_noop(self):
        """Zero-vis padding entries must not change the grid."""
        rng = np.random.default_rng(3)
        kernel, uv, sub_uv, w_plane, vis, wg = random_case(rng, n=20)
        pixels = wg.shape[-1]
        pols = vis.shape[1]

        def run(uv, sub_uv, w_plane, vis):
            return np.asarray(gridder.grid_vis(
                jnp.zeros((pols, pixels, pixels), jnp.complex64),
                jnp.asarray(kernel), jnp.asarray(wg), jnp.asarray(uv),
                jnp.asarray(sub_uv), jnp.asarray(w_plane), jnp.asarray(vis),
                pixels=pixels))

        base = run(uv, sub_uv, w_plane, vis)
        pad = 7
        uv_p = np.concatenate([uv, np.zeros((pad, 2), np.int16)])
        sub_p = np.concatenate([sub_uv, np.zeros((pad, 2), np.int16)])
        wp_p = np.concatenate([w_plane, np.zeros(pad, np.int16)])
        vis_p = np.concatenate([vis, np.zeros((pad, vis.shape[1]), np.complex64)])
        padded = run(uv_p, sub_p, wp_p, vis_p)
        np.testing.assert_allclose(padded, base, rtol=1e-6)


class TestDegrid:
    def test_matches_oracle(self):
        rng = np.random.default_rng(7)
        kernel, uv, sub_uv, w_plane, vis, wg = random_case(rng)
        pixels = wg.shape[-1]
        pols = vis.shape[1]
        grid = (rng.normal(size=(pols, pixels, pixels))
                + 1j * rng.normal(size=(pols, pixels, pixels))).astype(np.complex64)
        weights = rng.uniform(0.1, 2.0, size=vis.shape).astype(np.float32)

        expected = gridder.degrid_vis_reference(
            grid, kernel, uv, sub_uv, w_plane, weights, vis)
        out = gridder.degrid_vis(
            jnp.asarray(grid), jnp.asarray(kernel), jnp.asarray(uv),
            jnp.asarray(sub_uv), jnp.asarray(w_plane), jnp.asarray(weights),
            jnp.asarray(vis), pixels=pixels)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-3, atol=2e-3)

    def test_degrid_inverts_point(self):
        """Degridding a grid containing the FT of a centred point source with
        the same kernel used for gridding recovers a consistent scale."""
        rng = np.random.default_rng(11)
        K, oversample, pixels = 8, 4, 64
        kernel = wkernel.antialias_w_kernel(
            10.0, np.array([0.0]), K, oversample, 7.0, 4,
            wkernel.default_beta(7.0))
        uv = np.array([[3, -2]], np.int16)
        sub_uv = np.array([[1, 2]], np.int16)
        w_plane = np.zeros(1, np.int16)
        vis = np.array([[1.0 + 0j]], np.complex64)
        wg = np.ones((1, pixels, pixels), np.float32)
        grid = np.asarray(gridder.grid_vis(
            jnp.zeros((1, pixels, pixels), jnp.complex64),
            jnp.asarray(kernel), jnp.asarray(wg), jnp.asarray(uv),
            jnp.asarray(sub_uv), jnp.asarray(w_plane), jnp.asarray(vis),
            pixels=pixels))
        # gridded power: sum over footprint = (sum of kernel taps)^2 conj
        taps_u = kernel[0, int(sub_uv[0, 0])]
        taps_v = kernel[0, int(sub_uv[0, 1])]
        expected_sum = np.conj(np.sum(taps_u) * np.sum(taps_v))
        np.testing.assert_allclose(np.sum(grid), expected_sum, rtol=1e-5)
