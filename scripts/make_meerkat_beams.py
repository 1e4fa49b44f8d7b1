"""Generate the bundled MeerKAT primary-beam model tables.

The reference ships measured MeerKAT beams as katsdpmodels-format HDF5
(``katsdpimager/models/beams/meerkat/v1/beam_{L,UHF}.h5``: voltage samples
on a radial sine-projection grid per frequency, sampled by
``primary_beam.py:20-188``).  This script derives this repo's bundled
tables from those measured models: the 1024-point frequency axis is
downsampled to 128 points (the beam varies smoothly in frequency; the
loader interpolates linearly either way) and the radial voltage samples
are kept at full resolution.  Output format is the one
``katsdpimager_tpu.primary_beam.load_hdf5_beam`` reads: ``frequency``
(F,) Hz, ``beam`` (F, R) voltage samples, ``radius`` (R,) direction-cosine
radii.

Usage: python scripts/make_meerkat_beams.py [src_dir] [dst_dir]
"""

import os
import sys

import h5py
import numpy as np

SRC = (sys.argv[1] if len(sys.argv) > 1
       else "/root/reference/katsdpimager/models/beams/meerkat/v1")
DST = (sys.argv[2] if len(sys.argv) > 2
       else os.path.join(os.path.dirname(os.path.dirname(
           os.path.abspath(__file__))),
           "katsdpimager_tpu", "models", "beams", "meerkat", "v1"))
NUM_FREQS = 128


def main():
    os.makedirs(DST, exist_ok=True)
    for band in ("L", "UHF"):
        with h5py.File(os.path.join(SRC, f"beam_{band}.h5"), "r") as f:
            freqs = np.asarray(f["frequencies"], np.float64)
            beam = np.asarray(f["beam"], np.float64)
            step = float(f["beam"].attrs["step"])
        new_freqs = np.linspace(freqs[0], freqs[-1], NUM_FREQS)
        new_beam = np.empty((NUM_FREQS, beam.shape[1]), np.float32)
        for r in range(beam.shape[1]):
            new_beam[:, r] = np.interp(new_freqs, freqs, beam[:, r])
        radii = np.arange(beam.shape[1], dtype=np.float64) * step
        out = os.path.join(DST, f"beam_{band}.h5")
        with h5py.File(out, "w") as f:
            f.create_dataset("frequency", data=new_freqs)
            f.create_dataset("beam", data=new_beam)
            f.create_dataset("radius", data=radii)
            f.attrs["description"] = (
                f"MeerKAT {band}-band measured primary beam (voltage, "
                "radially averaged), downsampled in frequency from the "
                "katsdpmodels v1 table")
        print(out, new_beam.shape, "radius step", step)


if __name__ == "__main__":
    main()
