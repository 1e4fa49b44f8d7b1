"""Tests for the anti-aliasing + W kernel generation.

Golden-value strategy mirrors the reference's test_grid.py: check against
from-first-principles evaluations of the window functions and DFTs.
"""

import math

import numpy as np
import pytest

from katsdpimager_tpu.ops import wkernel


class TestKaiserBessel:
    def test_center_is_one(self):
        assert wkernel.kaiser_bessel(0.0, 6.0, 8.0) == pytest.approx(1.0)

    def test_outside_support_zero(self):
        np.testing.assert_array_equal(
            wkernel.kaiser_bessel(np.array([-3.5, 3.01, 10.0]), 6.0, 8.0), 0.0)

    def test_explicit_value(self):
        # i0(beta*sqrt(1-(2x/W)^2)) / i0(beta) at x=1, W=6, beta=2
        x, width, beta = 1.0, 6.0, 2.0
        expected = np.i0(beta * math.sqrt(1 - (2 * x / width) ** 2)) / np.i0(beta)
        assert wkernel.kaiser_bessel(x, width, beta) == pytest.approx(expected)

    def test_fourier_is_transform(self):
        """kaiser_bessel_fourier must match a numeric DFT of kaiser_bessel."""
        width, beta = 7.0, wkernel.default_beta(7.0)
        n = 8192
        dx = 0.01
        x = (np.arange(n) - n // 2) * dx
        kb = wkernel.kaiser_bessel(x, width, beta)
        freqs = np.array([0.0, 0.01, 0.05, 0.1, 0.13])
        for f in freqs:
            numeric = np.sum(kb * np.cos(2 * np.pi * f * x)) * dx
            analytic = wkernel.kaiser_bessel_fourier(np.array([f]), width, beta)[0]
            assert analytic == pytest.approx(numeric, abs=1e-4)


class TestAntialiasKernel:
    def test_shape_and_symmetry(self):
        k = wkernel.antialias_kernel(7.0, 8)
        assert k.shape == (8, 8)
        assert k.dtype == np.complex64
        # real-valued
        np.testing.assert_allclose(k.imag, 0, atol=1e-7)
        # Subpixel s and oversample-1-s kernels are mirror images
        np.testing.assert_allclose(k[0].real, k[7, ::-1].real, rtol=1e-5)

    def test_peak_near_centre(self):
        k = wkernel.antialias_kernel(7.0, 8)
        # For middle subpixels the peak must be at one of the central taps
        assert np.argmax(np.abs(k[3])) in (3, 4)
        assert np.argmax(np.abs(k[4])) in (3, 4)


class TestAntialiasWKernel:
    def test_w0_matches_antialias(self):
        """At w=0 the combined kernel is the pure anti-aliasing kernel:
        cross-check the DFT tabulation against direct KB evaluation."""
        oversample = 8
        width = 8
        aa_width = 7.0
        beta = wkernel.default_beta(aa_width)
        cell_wavelengths = 50.0
        combined = wkernel.antialias_w_kernel(
            cell_wavelengths, np.array([0.0]), width, oversample,
            aa_width, image_oversample=8, beta=beta)[0]
        direct = wkernel.antialias_kernel(aa_width, oversample, beta)
        # The combined kernel has the half-subpixel shift baked in; compare
        # against direct KB evaluation at the shifted positions.
        hsize = width // 2
        for s in range(oversample):
            bias = (s + 0.5) / oversample + hsize - 1
            expected = wkernel.kaiser_bessel(np.arange(width) - bias, aa_width, beta)
            np.testing.assert_allclose(combined[s].real, expected, atol=2e-3)
            np.testing.assert_allclose(combined[s].imag, 0, atol=2e-3)
        assert direct.shape[-1] == width

    def test_w_kernel_phase_structure(self):
        """A w != 0 kernel is complex with energy spread wider than w=0."""
        oversample = 8
        width = 32
        aa_width = 7.0
        beta = wkernel.default_beta(aa_width)
        # w must satisfy w * fov^2 >~ 1 (fov = 1/cell_wavelengths) to matter
        ks = wkernel.antialias_w_kernel(
            50.0, np.array([0.0, 20000.0]), width, oversample,
            aa_width, image_oversample=4, beta=beta)
        k0, kw = ks[0], ks[1]
        assert np.max(np.abs(kw.imag)) > 0.01
        # spread: second moment of |k|^2 about centre
        taps = np.arange(width) - (width - 1) / 2

        def spread(k):
            p = np.abs(k[0]) ** 2
            return np.sum(p * taps ** 2) / np.sum(p)

        assert spread(kw) > 2 * spread(k0)


class TestTaper:
    def test_matches_kbf(self):
        aa_width = 7.0
        beta = wkernel.default_beta(aa_width)
        N = 128
        t = wkernel.taper(N, aa_width, 8, beta)
        x = np.arange(N) / N - 0.5
        expected = wkernel.kaiser_bessel_fourier(x, aa_width, beta) * np.sinc(x / 8)
        np.testing.assert_allclose(t, expected, rtol=1e-12)


class TestPlaneWValues:
    def test_consistent_with_quantizer(self):
        """Kernel plane w values must equal the dequantized residual w of
        each plane (predict.uvw_scale_bias must agree)."""
        from katsdpimager_tpu import parameters, polarization
        from katsdpimager_tpu.ops import predict

        fixed = parameters.FixedImageParameters((polarization.STOKES_I,))
        ip = parameters.ImageParameters(fixed, wavelength=0.21,
                                        pixel_size=1e-4, pixels=1024)
        fgp = parameters.FixedGridParameters(
            antialias_width=7.0, oversample=8, image_oversample=4,
            max_w=1000.0, kernel_width=32)
        gp = parameters.GridParameters(fgp, w_slices=4, w_planes=8)
        ws = wkernel.plane_w_values(ip, gp)
        _uv_scale, w_scale, w_bias = predict.uvw_scale_bias(ip, gp)
        expected = np.arange(8) * w_scale + w_bias
        np.testing.assert_allclose(ws, expected, rtol=1e-12)
