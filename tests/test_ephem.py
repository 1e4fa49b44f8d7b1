"""Ephemeris math vs independent textbook formulations."""

import math

import numpy as np
import pytest

from katsdpimager_tpu import ephem, simulate


def test_gmst_reference_epoch():
    """GMST at J2000.0 (2000-01-01 12:00 UT) is 18h41m50.548s (Meeus)."""
    unix_j2000 = (2451545.0 - 2440587.5) * 86400.0
    expected = (18 + 41 / 60 + 50.54841 / 3600) / 24 * 2 * math.pi
    assert abs(ephem.gmst(unix_j2000) - expected) < 1e-6


def test_geodetic_round_trip():
    lat, lon, h = math.radians(-30.713), math.radians(21.444), 1086.0
    ecef = ephem.geodetic_to_ecef(lat, lon, h)
    lat2, lon2, h2 = ephem.ecef_to_geodetic(ecef)
    assert abs(lat2 - lat) < 1e-9
    assert abs(lon2 - lon) < 1e-12
    assert abs(h2 - h) < 1e-3


def test_uvw_basis_orthonormal():
    basis = ephem.uvw_basis(1.0, -0.6, np.array([1.6e9, 1.6e9 + 3600]))
    eye = np.einsum("tij,tkj->tik", basis, basis)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-12)


def test_antenna_uvw_matches_hourangle_formula():
    """ephem UVW == the classic (X, Y, Z)/hour-angle transformation used by
    the simulator (simulate.xyz_to_uvw), for antennas laid out in ENU at a
    site."""
    lat, lon = math.radians(-30.713), math.radians(21.444)
    site = ephem.geodetic_to_ecef(lat, lon, 1086.0)
    rot = ephem.enu_to_ecef_matrix(lat, lon)
    rng = np.random.default_rng(7)
    enu = rng.uniform(-500, 500, size=(5, 3))
    positions = site + enu @ rot.T

    ra, dec = 0.9, -0.7
    t = 1.7e9 + np.linspace(0, 3000, 4)
    out = ephem.antenna_uvw(positions, ra, dec, t, ref_position=site)

    # Independent: ENU -> equatorial XYZ -> UVW at the local hour angle.
    # The ENU->XYZ rotation uses the geodetic vertical, matching rot.
    xyz = simulate.enu_to_xyz(enu, lat)
    ha = ephem.hour_angle(lon, ra, t)
    u, v, w = simulate.xyz_to_uvw(xyz, ha, dec)      # each (T, A)
    expected = np.stack([u, v, w], axis=-1).transpose(1, 0, 2)  # (A, T, 3)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_parallactic_angle_meridian():
    """On the meridian (H=0) the parallactic angle is 0 (source north of
    zenith) or pi (south of zenith)."""
    lat, lon = math.radians(-30.0), 0.0
    ra, dec = 1.2, math.radians(-60.0)
    # Find a time when the source transits: gmst + lon - ra = 0
    t0 = 1.7e9
    ha0 = ephem.hour_angle(lon, ra, t0)
    # Earth rotates 2pi per sidereal day
    t_transit = t0 - ha0 / (2 * math.pi) * 86164.0905
    ha = ephem.hour_angle(lon, ra, t_transit)
    assert abs(ha) < 1e-6
    pa = ephem.parallactic_angle(lat, lon, ra, dec, t_transit)
    # dec -60 < lat -30: source is south of zenith, so the zenith lies due
    # north of the source -> pa = 0
    assert abs(pa) < 1e-3
    # and elevation is lat - dec from the pole geometry: 90 - |lat - dec|
    el = ephem.elevation(lat, lon, ra, dec, t_transit)
    assert abs(el - math.radians(90 - 30)) < 1e-3


def test_parallactic_angle_sign():
    """East of the meridian (H < 0, rising) the parallactic angle is
    negative in the southern hemisphere for a source north of zenith."""
    lat, lon = math.radians(-30.0), 0.0
    ra, dec = 1.2, math.radians(-10.0)
    t0 = 1.7e9
    ha0 = ephem.hour_angle(lon, ra, t0)
    t = t0 - (ha0 + 0.5) / (2 * math.pi) * 86164.0905
    assert ephem.hour_angle(lon, ra, t) < 0
    pa = ephem.parallactic_angle(lat, lon, ra, dec, t)
    # Standard convention check: pa = atan2(sin H cos lat, ...) < 0 for
    # H < 0 and cos lat > 0
    assert pa < 0
