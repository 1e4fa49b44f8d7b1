"""Direct-prediction tests vs numpy oracle (strategy mirrors reference
test_predict.py:54-97, including its phase-precision tolerance note)."""

import numpy as np
import jax.numpy as jnp
import pytest

from katsdpimager_tpu import parameters, polarization
from katsdpimager_tpu.ops import predict


def make_params():
    fixed = parameters.FixedImageParameters(
        (polarization.STOKES_I, polarization.STOKES_Q))
    ip = parameters.ImageParameters(fixed, wavelength=0.21,
                                    pixel_size=1e-4, pixels=1024)
    fgp = parameters.FixedGridParameters(
        antialias_width=7.0, oversample=8, image_oversample=4,
        max_w=500.0, kernel_width=16)
    gp = parameters.GridParameters(fgp, w_slices=3, w_planes=8)
    return ip, gp


class TestPredict:
    def test_matches_oracle(self):
        ip, gp = make_params()
        rng = np.random.default_rng(21)
        n, s, pols = 64, 10, 2

        uv = rng.integers(-200, 200, size=(n, 2)).astype(np.int16)
        sub_uv = rng.integers(0, 8, size=(n, 2)).astype(np.int16)
        w_plane = rng.integers(0, 8, size=n).astype(np.int16)
        vis = (rng.normal(size=(n, pols)) + 1j * rng.normal(size=(n, pols))
               ).astype(np.complex64)
        weights = rng.uniform(0.5, 2.0, size=(n, pols)).astype(np.float32)

        l = rng.uniform(-0.01, 0.01, s)
        m = rng.uniform(-0.01, 0.01, s)
        n1 = np.sqrt(1 - l * l - m * m) - 1
        lmn = np.stack([l, m, n1], axis=-1).astype(np.float32)
        flux = rng.uniform(0, 2, size=(s, pols)).astype(np.float32)

        uv_scale, w_scale, w_bias = predict.uvw_scale_bias(ip, gp)
        mid_w = 55.0
        expected = predict.predict_subtract_reference(
            lmn, flux, uv, sub_uv, w_plane, vis, weights,
            uv_scale, w_scale, w_bias + mid_w, 8)
        out = predict.predict_subtract(
            jnp.asarray(lmn), jnp.asarray(flux), jnp.asarray(uv),
            jnp.asarray(sub_uv), jnp.asarray(w_plane), jnp.asarray(vis),
            jnp.asarray(weights),
            jnp.float32(uv_scale), jnp.float32(w_scale),
            jnp.float32(w_bias + mid_w), oversample=8)
        # Tolerance is loose because f32 phase evaluation of 2*pi*large
        # differs between implementations (same caveat as the reference's
        # test_predict.py:88-92).
        np.testing.assert_allclose(np.asarray(out), expected, atol=5e-3)

    def test_extract_sky_image(self):
        ip, gp = make_params()
        model = np.zeros((2, 1024, 1024), np.float32)
        model[0, 512, 512] = 2.0       # at phase centre: l = m = 0
        model[1, 512, 512] = 0.5
        model[0, 500, 600] = 1.0
        lmn, flux = predict.extract_sky_image(ip, gp, model)
        assert lmn.shape == (2, 3)
        # centre source: l = m = 0, n-1 = 0
        i0 = int(np.argmin(np.abs(lmn[:, 0])))
        np.testing.assert_allclose(lmn[i0], 0.0, atol=1e-10)
        np.testing.assert_allclose(flux[i0], [2.0, 0.5], rtol=1e-5)
        i1 = 1 - i0
        np.testing.assert_allclose(lmn[i1, 0], (600 - 512) * 1e-4, rtol=1e-5)
        np.testing.assert_allclose(lmn[i1, 1], (500 - 512) * 1e-4, rtol=1e-5)

    def test_zero_sources_noop(self):
        ip, gp = make_params()
        vis = jnp.ones((4, 2), jnp.complex64)
        out = predict.predict_subtract(
            jnp.zeros((0, 3), jnp.float32), jnp.zeros((0, 2), jnp.float32),
            jnp.zeros((4, 2), jnp.int16), jnp.zeros((4, 2), jnp.int16),
            jnp.zeros((4,), jnp.int16), vis, jnp.ones((4, 2), jnp.float32),
            jnp.float32(1.0), jnp.float32(1.0), jnp.float32(0.0), oversample=8)
        np.testing.assert_array_equal(np.asarray(out), 1.0)


class TestBeam:
    def test_fit_round_trip(self):
        """Fitting a synthetic Gaussian PSF recovers its parameters."""
        from katsdpimager_tpu.ops import beam as beam_mod

        pixels = 128
        major_fwhm, minor_fwhm, theta = 10.0, 6.0, 0.7
        b = beam_mod.Beam(major_fwhm, minor_fwhm, theta)
        M = b.covariance_sqrt()
        icov = np.linalg.inv(M @ M.T)
        yy, xx = np.meshgrid(np.arange(pixels) - 64, np.arange(pixels) - 64,
                             indexing="ij")
        q = (icov[0, 0] * yy ** 2 + 2 * icov[0, 1] * yy * xx
             + icov[1, 1] * xx ** 2)
        psf = np.exp(-0.5 * q)
        fit = beam_mod.fit_beam(psf)
        assert fit.major == pytest.approx(major_fwhm, rel=1e-3)
        assert fit.minor == pytest.approx(minor_fwhm, rel=1e-3)
        assert fit.theta == pytest.approx(theta, abs=1e-3)

    def test_convolve_point_source(self):
        """Convolving a delta with the beam reproduces the beam shape with
        unit peak."""
        from katsdpimager_tpu.ops import beam as beam_mod

        pixels = 128
        b = beam_mod.Beam(8.0, 5.0, 0.3)
        model = np.zeros((1, pixels, pixels), np.float32)
        model[0, 64, 64] = 1.0
        out = np.asarray(beam_mod.convolve_beam(model, b))
        assert out[0, 64, 64] == pytest.approx(1.0, rel=1e-3)
        # total flux = beam area
        assert np.sum(out) == pytest.approx(beam_mod.beam_area(b), rel=1e-3)
        fit = beam_mod.fit_beam(out[0])
        assert fit.major == pytest.approx(8.0, rel=0.01)
        assert fit.minor == pytest.approx(5.0, rel=0.01)


class TestPredictExact:
    def test_matches_trig_path_and_oracle(self):
        """predict_subtract_exact (trig-free roots-of-unity table) vs the
        trig path and the f64 oracle, for pixel-grid components."""
        ip, gp = make_params()
        rng = np.random.default_rng(5)
        n, s, pols = 300, 12, 2
        pixels, oversample = ip.pixels, gp.fixed.oversample

        model = np.zeros((pols, pixels, pixels), np.float32)
        ys = rng.integers(pixels // 4, 3 * pixels // 4, s)
        xs = rng.integers(pixels // 4, 3 * pixels // 4, s)
        model[:, ys, xs] = rng.uniform(0.2, 1.0, (pols, s)).astype(np.float32)

        lmn, flux, xi, yi = predict.extract_sky_image(ip, gp, model,
                                                      return_pixels=True)
        uv = rng.integers(-300, 300, size=(n, 2)).astype(np.int16)
        sub_uv = rng.integers(0, oversample, size=(n, 2)).astype(np.int16)
        w_plane = rng.integers(0, gp.w_planes, size=n).astype(np.int16)
        vis = (rng.normal(size=(n, pols))
               + 1j * rng.normal(size=(n, pols))).astype(np.complex64)
        weights = rng.uniform(0.5, 2.0, size=(n, pols)).astype(np.float32)
        uv_scale, w_scale, w_bias = predict.uvw_scale_bias(ip, gp)

        # f64 oracle built from the INTEGER pixel coordinates (the f32
        # lmn from extract_sky_image carries ~1e-7 rounding that the
        # exact path does not have)
        l64 = xi.astype(np.float64) * float(ip.pixel_size)
        m64 = yi.astype(np.float64) * float(ip.pixel_size)
        lmn64 = np.stack(
            [l64, m64, np.sqrt(1 - l64 * l64 - m64 * m64) - 1], -1)
        want = predict.predict_subtract_reference(
            lmn64, flux, uv, sub_uv, w_plane,
            vis.astype(np.complex128), weights, uv_scale, w_scale, w_bias,
            oversample)
        got_trig = np.asarray(predict.predict_subtract(
            jnp.asarray(lmn), jnp.asarray(flux), jnp.asarray(uv),
            jnp.asarray(sub_uv), jnp.asarray(w_plane), jnp.asarray(vis),
            jnp.asarray(weights), uv_scale, w_scale, w_bias,
            oversample=oversample))
        got_exact = np.asarray(predict.predict_subtract_exact(
            jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(lmn[:, 2]),
            jnp.asarray(flux), jnp.asarray(uv), jnp.asarray(sub_uv),
            jnp.asarray(vis), jnp.asarray(weights), jnp.asarray(w_plane),
            w_scale, w_bias, pixels=pixels, oversample=oversample,
            w_planes=gp.w_planes, block=128))
        scale = np.abs(want).max()
        # the exact path has no phase rounding at all: only the w-phase
        # trig and the flux matmul are f32
        assert np.abs(got_exact - want).max() / scale < 2e-6
        # the trig path carries f32 phase rounding amplified by the
        # phase magnitude (reference test_predict.py tolerance note)
        assert np.abs(got_trig - want).max() / scale < 5e-5
        assert (np.abs(got_exact - want).max()
                <= np.abs(got_trig - want).max())

    def test_blocking_invariance(self):
        """Same result for block sizes spanning and padding the input."""
        ip, gp = make_params()
        rng = np.random.default_rng(6)
        n, pols = 100, 2
        pixels, oversample = ip.pixels, gp.fixed.oversample
        model = np.zeros((pols, pixels, pixels), np.float32)
        model[:, 500, 520] = 1.0
        lmn, flux, xi, yi = predict.extract_sky_image(ip, gp, model,
                                                      return_pixels=True)
        uv = rng.integers(-100, 100, size=(n, 2)).astype(np.int16)
        sub_uv = rng.integers(0, oversample, size=(n, 2)).astype(np.int16)
        w_plane = rng.integers(0, gp.w_planes, size=n).astype(np.int16)
        vis = (rng.normal(size=(n, pols))
               + 1j * rng.normal(size=(n, pols))).astype(np.complex64)
        weights = np.ones((n, pols), np.float32)
        _, w_scale, w_bias = predict.uvw_scale_bias(ip, gp)
        outs = []
        for block in (32, 128, 512):
            outs.append(np.asarray(predict.predict_subtract_exact(
                jnp.asarray(xi), jnp.asarray(yi), jnp.asarray(lmn[:, 2]),
                jnp.asarray(flux), jnp.asarray(uv), jnp.asarray(sub_uv),
                jnp.asarray(vis), jnp.asarray(weights),
                jnp.asarray(w_plane), w_scale, w_bias, pixels=pixels,
                oversample=oversample, w_planes=gp.w_planes, block=block)))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
        np.testing.assert_allclose(outs[0], outs[2], atol=1e-6)
