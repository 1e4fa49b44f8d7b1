"""Tests for parameter derivation (sizing equations)."""

import math

import numpy as np
import pytest

from katsdpimager_tpu import parameters, polarization, units


def make_ip(pixels=4096, pixel_size=None, frequency=1.284e9,
            longest_baseline=8000.0):
    fixed = parameters.FixedImageParameters(
        polarizations=tuple(polarization.STOKES_IQUV), precision="single")
    array = parameters.ArrayParameters(antenna_diameter=13.5,
                                       longest_baseline=longest_baseline)
    return parameters.make_image_parameters(
        fixed, q_fov=1.0, image_oversample=5.0, frequency_hz=frequency,
        array=array, pixel_size=pixel_size, pixels=pixels)


class TestIsSmooth:
    def test_basic(self):
        assert parameters.is_smooth(8)
        assert parameters.is_smooth(1024)
        assert parameters.is_smooth(8 * 3 * 5 * 7)
        assert not parameters.is_smooth(12)  # not a multiple of 8
        assert not parameters.is_smooth(88)  # 8 * 11


class TestImageParameters:
    def test_pixel_size_from_array(self):
        ip = make_ip()
        wavelength = units.C_M_PER_S / 1.284e9
        expected = wavelength / (2.0 / 3.0 * 5.0 * 8000.0)
        assert ip.pixel_size == pytest.approx(expected)
        assert ip.cell_size == pytest.approx(wavelength / (ip.pixel_size * 4096))

    def test_pixels_derived_smooth(self):
        fixed = parameters.FixedImageParameters(
            polarizations=(polarization.STOKES_I,), precision="single")
        array = parameters.ArrayParameters(13.5, 8000.0)
        ip = parameters.make_image_parameters(
            fixed, 1.0, 5.0, 1.284e9, array)
        assert parameters.is_smooth(ip.pixels)

    def test_non_smooth_rejected(self):
        with pytest.raises(ValueError):
            make_ip(pixels=1016)  # 1016 = 8 * 127


class TestWSlices:
    def test_monotonic_and_sufficient(self):
        ip = make_ip()
        max_w = 8000.0
        kw = 60
        slices = parameters.w_slices(ip, max_w, 0.001, kw, antialias_width=7)
        # the resulting residual w kernel must fit in the kernel width
        residual_w = max_w * 0.5 / (slices - 0.5)
        assert parameters.w_kernel_width(ip, residual_w, 0.001, 7) <= kw
        if slices > 1:
            residual_w2 = max_w * 0.5 / (slices - 1.5)
            assert parameters.w_kernel_width(ip, residual_w2, 0.001, 7) > kw

    def test_w_kernel_width_formula(self):
        ip = make_ip()
        fov = ip.image_size
        w_m = 1000.0
        wl = w_m / ip.wavelength
        expected = math.sqrt(
            4 * fov ** 2 * ((wl * fov / 2) ** 2 + wl ** 1.5 * fov / (2 * math.pi * 0.01))
            + 49.0)
        assert parameters.w_kernel_width(ip, w_m, 0.01, 7.0) == pytest.approx(expected)


class TestPolarization:
    def test_iquv_identity(self):
        m = polarization.polarization_matrix(
            polarization.STOKES_IQUV, polarization.STOKES_IQUV)
        np.testing.assert_allclose(m, np.eye(4), atol=1e-6)

    def test_linear_to_stokes(self):
        inputs = [polarization.STOKES_XX, polarization.STOKES_XY,
                  polarization.STOKES_YX, polarization.STOKES_YY]
        m = polarization.polarization_matrix(polarization.STOKES_IQUV, inputs)
        # I = (XX + YY)/2, Q = (XX - YY)/2, U = (XY + YX)/2, V = (XY - YX)/(2i)
        expected = np.array([
            [0.5, 0, 0, 0.5],
            [0.5, 0, 0, -0.5],
            [0, 0.5, 0.5, 0],
            [0, -0.5j, 0.5j, 0],
        ])
        np.testing.assert_allclose(m, expected, atol=1e-6)

    def test_insufficient_inputs(self):
        with pytest.raises(ValueError):
            polarization.polarization_matrix(
                polarization.STOKES_IQUV, [polarization.STOKES_XX])

    def test_stokes_i_from_parallel_hands(self):
        inputs = [polarization.STOKES_XX, polarization.STOKES_YY]
        m = polarization.polarization_matrix([polarization.STOKES_I], inputs)
        np.testing.assert_allclose(m, [[0.5, 0.5]], atol=1e-6)

    def test_parse(self):
        assert polarization.parse_stokes("I") == [polarization.STOKES_I]
        assert polarization.parse_stokes("QI") == [polarization.STOKES_I,
                                                   polarization.STOKES_Q]
        with pytest.raises(ValueError):
            polarization.parse_stokes("IX")
        with pytest.raises(ValueError):
            polarization.parse_stokes("II")


class TestUnits:
    def test_parse_quantities(self):
        q = units.parse_quantity("18arcsec")
        assert q.physical_type == "angle"
        assert q.value == pytest.approx(18 / 3600 / 180 * math.pi)
        assert units.parse_quantity("2.5m").physical_type == "length"
        assert units.parse_quantity("1.4GHz").value == pytest.approx(1.4e9)
        assert units.parse_quantity("1.0").physical_type == "dimensionless"
