"""Local sky models for continuum subtraction (``--subtract``).

Capability parity with the reference ``sky_model.py``: a :class:`SkyModel`
exposes ``lmn(phase_centre)`` and ``flux_density(wavelength)``; models load
from files via :func:`open_sky_model`.

Supported formats:

- whitespace-separated text like the reference's ``tests/lsm.txt``
  (``ra dec I [Q U V]`` with ra in ``h:m:s`` and dec in ``d:m:s``, or
  decimal degrees); lines starting with ``#`` are comments;
- katpoint-catalogue and katdal-telstate models raise a clear error when
  their (unavailable) dependencies are missing.
"""

from __future__ import annotations

import math
import re
import urllib.parse
from typing import List, Tuple

import numpy as np


class NoSkyModelError(Exception):
    """No sky model is available for the data set."""


def _parse_ra(text: str) -> float:
    """RA in radians from h:m:s or decimal degrees."""
    if ":" in text:
        parts = [float(p) for p in text.split(":")]
        hours = parts[0] + parts[1] / 60 + (parts[2] if len(parts) > 2 else 0) / 3600
        return hours * math.pi / 12
    return math.radians(float(text))


def _parse_dec(text: str) -> float:
    """Dec in radians from d:m:s or decimal degrees."""
    if ":" in text:
        neg = text.strip().startswith("-")
        parts = [abs(float(p)) for p in text.split(":")]
        deg = parts[0] + parts[1] / 60 + (parts[2] if len(parts) > 2 else 0) / 3600
        return math.radians(-deg if neg else deg)
    return math.radians(float(text))


class SkyModel:
    """Point-source sky model with power-law spectra.

    positions: (S, 2) radians (ra, dec); flux: (S, 4) IQUV Jy at the
    reference frequency; spectral_index: (S,) (0 = flat);
    ref_freq: reference frequency in Hz.
    """

    def __init__(self, positions: np.ndarray, flux_iquv: np.ndarray,
                 spectral_index=None, ref_freq: float = 1.4e9):
        self.positions = np.asarray(positions, np.float64)
        self.flux_iquv = np.asarray(flux_iquv, np.float64)
        self.spectral_index = (np.zeros(len(self.positions))
                               if spectral_index is None
                               else np.asarray(spectral_index, np.float64))
        self.ref_freq = ref_freq

    def __len__(self):
        return len(self.positions)

    def lmn(self, phase_centre: Tuple[float, float]) -> np.ndarray:
        """(S, 3) array of (l, m, n-1) relative to the phase centre."""
        ra0, dec0 = phase_centre
        ra = self.positions[:, 0]
        dec = self.positions[:, 1]
        l = np.cos(dec) * np.sin(ra - ra0)
        m = (np.sin(dec) * np.cos(dec0)
             - np.cos(dec) * np.sin(dec0) * np.cos(ra - ra0))
        n1 = np.sqrt(1.0 - l * l - m * m) - 1.0
        return np.stack([l, m, n1], axis=-1)

    def flux_density(self, wavelength: float) -> np.ndarray:
        """(S, 4) IQUV flux densities at the given wavelength
        (power law: S(f) = S0 (f/f0)^alpha)."""
        from .units import C_M_PER_S

        freq = C_M_PER_S / wavelength
        scale = (freq / self.ref_freq) ** self.spectral_index
        return self.flux_iquv * scale[:, None]


def parse_text_model(text: str) -> SkyModel:
    """Parse ``ra dec I [Q U V [alpha [ref_freq_MHz]]]`` lines."""
    positions: List[Tuple[float, float]] = []
    fluxes: List[Tuple[float, float, float, float]] = []
    alphas: List[float] = []
    ref_freq = 1.4e9
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        fields = re.split(r"[,\s]+", line)
        ra = _parse_ra(fields[0])
        dec = _parse_dec(fields[1])
        vals = [float(v) for v in fields[2:6]]
        while len(vals) < 4:
            vals.append(0.0)
        alpha = float(fields[6]) if len(fields) > 6 else 0.0
        if len(fields) > 7:
            ref_freq = float(fields[7]) * 1e6
        positions.append((ra, dec))
        fluxes.append(tuple(vals))
        alphas.append(alpha)
    return SkyModel(np.array(positions), np.array(fluxes),
                    np.array(alphas), ref_freq)


def open_sky_model(url: str) -> SkyModel:
    """Open a sky model from a URL/path, with ``format=`` query parameter
    (parity with reference sky_model.py:166-233)."""
    parsed = urllib.parse.urlparse(url)
    params = urllib.parse.parse_qs(parsed.query)
    fmt = params.get("format", ["text"])[0]
    path = parsed.path or url.split("?")[0]
    if fmt in ("text", "lsm"):
        with open(path) as f:
            return parse_text_model(f.read())
    if fmt == "katpoint":
        raise NoSkyModelError(
            "katpoint catalogue models require the katpoint package, which "
            "is not available in this build")
    raise ValueError(f"Unknown sky model format {fmt!r}")
