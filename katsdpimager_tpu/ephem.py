"""Astropy/katpoint-free ephemeris math for the data loaders.

The reference computes per-antenna UVW coordinates and parallactic/feed
angles with katpoint (``loader_katdal.py:376-397``) or astropy CIRS/AltAz
(``loader_ms.py:244-306``).  Neither package is a dependency of this
build, so this module provides the required subset from first principles:

- Greenwich Mean Sidereal Time from UNIX time (IAU 1982-class polynomial,
  good to well under an arcsecond over decades);
- per-antenna (u, v, w) projections toward a (ra, dec) target, in the
  standard radio-interferometry frame (u east, v north on the celestial
  sphere, w toward the source) — baseline uvw = uvw[ant2] - uvw[ant1],
  matching the ``loader_core`` sign convention (position2 - position1);
- parallactic angle and elevation via the hour angle at the antenna's
  geodetic (WGS84) site.

Deliberate simplification (doc/DEVIATIONS.md): catalogue (ra, dec) is
treated as the apparent place — precession/nutation/aberration (≲ a few
arcmin of frame rotation) are not applied.  For imaging this rotates the
restored image frame by the same small angle for every baseline; flux,
noise and geometry statistics are unaffected.  The reference's katpoint
path applies them; swap in katpoint/astropy here if absolute astrometry
at the sub-arcminute level is required.
"""

from __future__ import annotations

import numpy as np

#: UNIX epoch as Julian Date
_JD_UNIX = 2440587.5
#: J2000.0 epoch as Julian Date
_JD_J2000 = 2451545.0

# WGS84 ellipsoid
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_WGS84_E2 = _WGS84_F * (2.0 - _WGS84_F)


def gmst(unix_time):
    """Greenwich Mean Sidereal Time (radians) from UNIX seconds.

    Meeus (1998) eq. 12.4, treating UTC as UT1 (|UT1-UTC| < 0.9 s, i.e.
    < 0.014 arcsec of rotation — negligible here).
    """
    t = np.asarray(unix_time, np.float64)
    jd = _JD_UNIX + t / 86400.0
    d = jd - _JD_J2000
    tc = d / 36525.0
    gmst_deg = (280.46061837 + 360.98564736629 * d
                + 0.000387933 * tc * tc - tc ** 3 / 38710000.0)
    return np.deg2rad(gmst_deg % 360.0)


def ecef_to_geodetic(xyz):
    """(lat, lon, height) in radians/metres from ECEF (Bowring's method)."""
    x, y, z = np.asarray(xyz, np.float64).T
    lon = np.arctan2(y, x)
    p = np.hypot(x, y)
    b = _WGS84_A * (1.0 - _WGS84_F)
    e2b = _WGS84_E2 / (1.0 - _WGS84_E2)
    theta = np.arctan2(z * _WGS84_A, p * b)
    lat = np.arctan2(z + e2b * b * np.sin(theta) ** 3,
                     p - _WGS84_E2 * _WGS84_A * np.cos(theta) ** 3)
    n = _WGS84_A / np.sqrt(1.0 - _WGS84_E2 * np.sin(lat) ** 2)
    height = p / np.cos(lat) - n
    return lat.T, lon.T, height.T


def geodetic_to_ecef(lat, lon, height=0.0):
    """ECEF (3,) from geodetic latitude/longitude (radians) and height."""
    n = _WGS84_A / np.sqrt(1.0 - _WGS84_E2 * np.sin(lat) ** 2)
    x = (n + height) * np.cos(lat) * np.cos(lon)
    y = (n + height) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - _WGS84_E2) + height) * np.sin(lat)
    return np.stack([x, y, z], axis=-1)


def enu_to_ecef_matrix(lat, lon):
    """(3, 3) matrix taking local (east, north, up) offsets to ECEF."""
    sl, cl = np.sin(lat), np.cos(lat)
    so, co = np.sin(lon), np.cos(lon)
    return np.array([[-so, -sl * co, cl * co],
                     [co, -sl * so, cl * so],
                     [0.0, cl, sl]])


def source_ecef(ra, dec, unix_time):
    """Unit vector(s) toward (ra, dec) in the rotating ECEF frame.

    A source with RA ``alpha`` crosses the Greenwich meridian (+x) when
    GMST == alpha; shape broadcast of ``unix_time`` against scalars.
    """
    ha_g = gmst(unix_time) - ra          # Greenwich hour angle
    cd = np.cos(dec)
    return np.stack([cd * np.cos(-ha_g), cd * np.sin(-ha_g),
                     np.sin(dec) * np.ones_like(ha_g)], axis=-1)


def uvw_basis(ra, dec, unix_time):
    """(3, 3) orthonormal (u_hat, v_hat, w_hat) rows in ECEF per time.

    w toward the source; u toward increasing RA (east on the sky);
    v completes the right-handed set (north).  For array input of T times
    the result is (T, 3, 3).
    """
    w_hat = source_ecef(ra, dec, unix_time)
    z = np.zeros_like(w_hat)
    z[..., 2] = 1.0
    u_hat = np.cross(z, w_hat)
    norm = np.linalg.norm(u_hat, axis=-1, keepdims=True)
    # At the celestial pole u is degenerate; pick x (never hit in practice)
    u_hat = np.where(norm > 1e-12, u_hat / np.where(norm > 0, norm, 1.0),
                     np.array([1.0, 0.0, 0.0]))
    v_hat = np.cross(w_hat, u_hat)
    return np.stack([u_hat, v_hat, w_hat], axis=-2)


def antenna_uvw(positions_ecef, ra, dec, unix_time, ref_position=None):
    """Per-antenna (u, v, w) in metres toward the target.

    Parameters: ``positions_ecef`` (A, 3); ``unix_time`` scalar or (T,);
    ``ref_position`` (3,) defaults to the mean antenna position.  Returns
    (A, 3) for scalar time or (A, T, 3) — baseline uvw for (a, b) is
    ``out[b] - out[a]`` (reference loader_katdal.py:394-395).
    """
    pos = np.asarray(positions_ecef, np.float64)
    if ref_position is None:
        ref_position = pos.mean(axis=0)
    rel = pos - np.asarray(ref_position, np.float64)
    basis = uvw_basis(ra, dec, unix_time)     # (..., 3, 3)
    out = np.einsum("...ij,aj->a...i", basis, rel)
    return out


def hour_angle(lon, ra, unix_time):
    """Local hour angle (radians, wrapped to [-pi, pi))."""
    ha = gmst(unix_time) + lon - ra
    return (ha + np.pi) % (2 * np.pi) - np.pi


def parallactic_angle(lat, lon, ra, dec, unix_time):
    """Parallactic angle (radians): the position angle of the local
    vertical (toward zenith) measured at the source from celestial north,
    positive toward east."""
    ha = hour_angle(lon, ra, unix_time)
    return np.arctan2(
        np.cos(lat) * np.sin(ha),
        np.sin(lat) * np.cos(dec) - np.cos(lat) * np.sin(dec) * np.cos(ha))


def elevation(lat, lon, ra, dec, unix_time):
    """Source elevation (radians) above the horizon."""
    ha = hour_angle(lon, ra, unix_time)
    s = (np.sin(lat) * np.sin(dec)
         + np.cos(lat) * np.cos(dec) * np.cos(ha))
    return np.arcsin(np.clip(s, -1.0, 1.0))
