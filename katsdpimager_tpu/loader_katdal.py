"""MeerKAT katdal (MVFv4 / .rdb) loader.

Parity target: reference ``loader_katdal.py`` (target selection,
corr-product permutation, RFI/band channel masks, katpoint UVW and
parallactic angles, telstate sky models).  The katdal dependency tree
(katdal, katpoint, dask, katsdpmodels) is not available in this build, so
this loader raises ImportError with guidance.  The class is registered so
``.rdb`` inputs produce an actionable message rather than "unknown format".
"""

from __future__ import annotations

from . import loader_core


class LoaderKatdal(loader_core.LoaderBase):
    @classmethod
    def match(cls, filename: str) -> bool:
        return (filename.endswith(".rdb")
                or filename.startswith("redis://")
                or filename.startswith("http://")
                or filename.startswith("https://"))

    def __init__(self, filename, options, start_channel=0, stop_channel=None):
        try:
            import katdal  # type: ignore # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "katdal is required to read MeerKAT datasets; install "
                "katdal/katpoint or export the data to MS / native HDF5"
            ) from exc
        raise NotImplementedError(
            "katdal loading is not yet implemented in this build")

    def antenna_diameter(self):
        raise NotImplementedError

    def longest_baseline(self):
        raise NotImplementedError

    def num_channels(self):
        raise NotImplementedError

    def frequency(self, channel):
        raise NotImplementedError

    def phase_centre(self):
        raise NotImplementedError

    def polarizations(self):
        raise NotImplementedError

    def data_iter(self, start_channel, stop_channel, max_chunk_vis=None):
        raise NotImplementedError
