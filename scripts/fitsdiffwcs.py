#!/usr/bin/env python
"""Compare two FITS images at matching WORLD coordinates.

Analogue of the reference's ``scripts/fitsdiffwcs.py`` (astropy.wcs +
scipy interpolation there): for every pixel of the first image the second
image is sampled at the same (RA, Dec, Stokes) via bilinear
interpolation, and max/rms differences are reported.  Only the SIN
projection written by this framework's FITS writer (and read by
``katsdpimager_tpu.io.read_fits``) is supported; pixels falling outside
the second image's footprint compare as NaN, matching the reference's
asymmetric semantics.

Exit status is 1 when the maximum absolute difference exceeds
``--tolerance`` (0 disables the check).
"""

import argparse
import math
import sys

import numpy as np


class WcsImage:
    """Single-HDU image with the (RA---SIN, DEC--SIN, STOKES, FREQ) axes
    written by katsdpimager_tpu.io.write_fits_image."""

    def __init__(self, filename):
        from katsdpimager_tpu import io

        self.header, data = io.read_fits(filename)
        # data: (freq, stokes, dec, ra); collapse the frequency axis
        self.data = np.asarray(data)[0]
        h = self.header
        self.ra0 = math.radians(h["CRVAL1"])
        self.dec0 = math.radians(h["CRVAL2"])
        self.dra = math.radians(h["CDELT1"])
        self.ddec = math.radians(h["CDELT2"])
        self.rpix = (h["CRPIX1"] - 1.0, h["CRPIX2"] - 1.0)
        self.stokes0 = int(h.get("CRVAL3", 1))

    def lm_of(self, ra, dec):
        """SIN-projection direction cosines of (ra, dec) about our
        reference point."""
        dra = ra - self.ra0
        l = np.cos(dec) * np.sin(dra)
        m = (np.sin(dec) * np.cos(self.dec0)
             - np.cos(dec) * np.sin(self.dec0) * np.cos(dra))
        return l, m

    def world_grid(self):
        """(ra, dec) of every pixel (dec-major, ra axis reversed per FITS
        RA convention is already handled by the reader's flip)."""
        ny, nx = self.data.shape[-2:]
        x = (np.arange(nx) - self.rpix[0]) * math.sin(self.dra)
        y = (np.arange(ny) - self.rpix[1]) * math.sin(self.ddec)
        l, m = np.meshgrid(x, y)
        # inverse SIN projection about (ra0, dec0)
        n = np.sqrt(np.maximum(0.0, 1.0 - l * l - m * m))
        dec = np.arcsin(m * np.cos(self.dec0) + n * np.sin(self.dec0))
        ra = self.ra0 + np.arctan2(
            l, n * np.cos(self.dec0) - m * np.sin(self.dec0))
        return ra, dec

    def sample(self, ra, dec, stokes_index):
        """Bilinear sample at world coordinates; NaN outside."""
        l, m = self.lm_of(ra, dec)
        x = l / math.sin(self.dra) + self.rpix[0]
        y = m / math.sin(self.ddec) + self.rpix[1]
        ny, nx = self.data.shape[-2:]
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        fx = x - x0
        fy = y - y0
        ok = (x0 >= 0) & (x0 + 1 < nx) & (y0 >= 0) & (y0 + 1 < ny)
        x0c = np.clip(x0, 0, nx - 2)
        y0c = np.clip(y0, 0, ny - 2)
        img = self.data[stokes_index]
        val = ((1 - fy) * ((1 - fx) * img[y0c, x0c]
                           + fx * img[y0c, x0c + 1])
               + fy * ((1 - fx) * img[y0c + 1, x0c]
                       + fx * img[y0c + 1, x0c + 1]))
        return np.where(ok, val, np.nan)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="WCS-aware FITS image comparison")
    parser.add_argument("file1")
    parser.add_argument("file2")
    parser.add_argument("--tolerance", type=float, default=0.0,
                        help="Fail (exit 1) if max |diff| exceeds this "
                             "[disabled]")
    args = parser.parse_args(argv)

    a = WcsImage(args.file1)
    b = WcsImage(args.file2)
    ra, dec = a.world_grid()
    worst = 0.0
    for p in range(a.data.shape[0]):
        other = b.sample(ra, dec, min(p, b.data.shape[0] - 1))
        diff = a.data[p] - other
        finite = np.isfinite(diff)
        n = int(finite.sum())
        if n == 0:
            print(f"stokes {p}: no overlapping finite pixels")
            continue
        md = float(np.nanmax(np.abs(diff)))
        rms = float(np.sqrt(np.nanmean(diff[finite] ** 2)))
        worst = max(worst, md)
        print(f"stokes {p}: max |diff| {md:.6g}  rms {rms:.6g}  "
              f"({n} pixels compared)")
    if args.tolerance > 0 and worst > args.tolerance:
        print(f"FAIL: {worst:.6g} > tolerance {args.tolerance:.6g}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
