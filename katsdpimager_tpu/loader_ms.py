"""CASA Measurement Set loader.

Behavioural parity with the reference ``loader_ms.py``: reads DATA (or a
``-i data=COLUMN`` override), converts FLAG/FLAG_ROW to zero weights, uses
WEIGHT_SPECTRUM when present (else broadcasts WEIGHT), removes
autocorrelations, reads the phase centre from FIELD and frequencies from
SPECTRAL_WINDOW, and yields baseline-major chunks.

Requires ``python-casacore``; in environments without it (such as this
build's), construction raises ImportError with a clear message — the native
HDF5 format (:mod:`.loader_hdf5`) is the supported interchange path.
"""

from __future__ import annotations

import argparse
import os
from typing import Iterator, Optional

import numpy as np

from . import loader_core, polarization


def _casacore():
    try:
        import casacore.tables  # type: ignore
    except ImportError as exc:
        raise ImportError(
            "python-casacore is required to read Measurement Sets; install "
            "python-casacore or convert the MS to the native HDF5 format "
            "(see katsdpimager_tpu.loader_hdf5)") from exc
    return casacore.tables


class LoaderMS(loader_core.LoaderBase):
    @classmethod
    def match(cls, filename: str) -> bool:
        return filename.lower().endswith(".ms") and os.path.isdir(filename)

    def __init__(self, filename, options, start_channel=0, stop_channel=None):
        super().__init__(filename, options, start_channel, stop_channel)
        tables = _casacore()
        parser = argparse.ArgumentParser(prog="Measurement set options")
        parser.add_argument("--data", default="DATA",
                            help="Column containing visibilities")
        parser.add_argument("--data-desc", type=int, default=0,
                            help="Data description ID to image")
        parser.add_argument("--field", type=int, default=0,
                            help="Field to image")
        parser.add_argument("--pol-frame", choices=["sky", "feed"],
                            default="sky",
                            help="Reference frame for polarization")
        parser.add_argument("--uvw", choices=["casa", "strict"],
                            default="casa",
                            help="UVW sign convention (the casa default "
                                 "negates the Measurement Set definition, "
                                 "matching CASA and most imagers)")
        args = parser.parse_args(options)
        self._strict_uvw = args.uvw == "strict"
        self._feed_frame = args.pol_frame == "feed"
        if self._feed_frame:
            raise NotImplementedError(
                "-i pol-frame=feed needs per-visibility parallactic angles "
                "from antenna pointing (requires astropy); use sky frame or "
                "pre-rotate the data")
        self._options = args
        self._main = tables.table(filename, ack=False)
        self._data_col = args.data
        self._field = args.field
        self._data_desc = args.data_desc

        self._antenna = tables.table(filename + "::ANTENNA", ack=False)
        self._spw = tables.table(filename + "::SPECTRAL_WINDOW", ack=False)
        self._field_table = tables.table(filename + "::FIELD", ack=False)
        self._pol_table = tables.table(filename + "::POLARIZATION", ack=False)
        self._ddesc = tables.table(filename + "::DATA_DESCRIPTION", ack=False)

        spw_id = self._ddesc.getcell("SPECTRAL_WINDOW_ID", self._data_desc)
        pol_id = self._ddesc.getcell("POLARIZATION_ID", self._data_desc)
        self._frequencies = np.asarray(
            self._spw.getcell("CHAN_FREQ", spw_id), np.float64)
        self._corr_types = [int(x) for x in
                            self._pol_table.getcell("CORR_TYPE", pol_id)]
        positions = np.asarray(self._antenna.getcol("POSITION"))
        diffs = positions[:, None, :] - positions[None, :, :]
        self._longest = float(np.sqrt((diffs ** 2).sum(axis=-1)).max())
        diameters = np.asarray(self._antenna.getcol("DISH_DIAMETER"))
        self._diameter = float(diameters.min())
        self._has_weight_spectrum = "WEIGHT_SPECTRUM" in self._main.colnames()

    def antenna_diameter(self) -> float:
        return self._diameter

    def longest_baseline(self) -> float:
        return self._longest

    def num_channels(self) -> int:
        return len(self._frequencies)

    def frequency(self, channel: int) -> float:
        return float(self._frequencies[channel])

    def phase_centre(self):
        direction = np.asarray(
            self._field_table.getcell("PHASE_DIR", self._field)).reshape(-1)
        return float(direction[0]), float(direction[1])

    def polarizations(self):
        return list(self._corr_types)

    def data_iter(self, start_channel: int, stop_channel: int,
                  max_chunk_vis: Optional[int] = None) -> Iterator[dict]:
        total = self._main.nrows()
        C = stop_channel - start_channel
        step = total if max_chunk_vis is None else max(1, max_chunk_vis // max(C, 1))
        for start in range(0, total, step):
            nrow = min(total - start, step)
            ant1 = self._main.getcol("ANTENNA1", start, nrow)
            ant2 = self._main.getcol("ANTENNA2", start, nrow)
            field = self._main.getcol("FIELD_ID", start, nrow)
            keep = (ant1 != ant2) & (field == self._field)
            uvw = np.asarray(self._main.getcol("UVW", start, nrow), np.float32)
            if not self._strict_uvw:
                # CASA convention: negate relative to the MS definition
                # (reference loader_ms.py:452-453)
                uvw = -uvw
            data = self._main.getcol(self._data_col, start, nrow)
            data = data[:, start_channel:stop_channel, :]  # (rows, C, Q)
            flag = self._main.getcol("FLAG", start, nrow)[
                :, start_channel:stop_channel, :]
            flag_row = self._main.getcol("FLAG_ROW", start, nrow)
            if self._has_weight_spectrum:
                weights = self._main.getcol("WEIGHT_SPECTRUM", start, nrow)[
                    :, start_channel:stop_channel, :]
            else:
                weights = np.repeat(
                    self._main.getcol("WEIGHT", start, nrow)[:, None, :],
                    stop_channel - start_channel, axis=1)
            weights = np.where(flag | flag_row[:, None, None], 0.0, weights)
            uvw = uvw[keep]
            data = data[keep]
            weights = weights[keep]
            yield {
                "uvw": uvw,
                "vis": np.ascontiguousarray(
                    data.transpose(1, 0, 2).astype(np.complex64)),
                "weights": np.ascontiguousarray(
                    weights.transpose(1, 0, 2).astype(np.float32)),
                "progress": start + nrow,
                "total": total,
            }

    def extra_fits_headers(self):
        return {}

    @property
    def raw_data(self):
        return self._main

    def close(self):
        for t in (self._main, self._antenna, self._spw, self._field_table,
                  self._pol_table, self._ddesc):
            t.close()
