"""MS loader tests against a fake in-memory casacore (strategy mirrors
reference test_loader_katdal.py: fake the backend, exercise the loader)."""

import sys
import types

import numpy as np
import pytest

from katsdpimager_tpu import polarization


class FakeTable:
    def __init__(self, cols, nrows):
        self._cols = cols
        self._nrows = nrows

    def getcol(self, name, start=0, nrow=None):
        col = self._cols[name]
        if nrow is None:
            return col
        return col[start:start + nrow]

    def getcell(self, name, row):
        return self._cols[name][row]

    def colnames(self):
        return list(self._cols)

    def nrows(self):
        return self._nrows

    def close(self):
        pass


@pytest.fixture
def fake_ms(monkeypatch, tmp_path):
    """Install a fake casacore.tables module and build a tiny MS."""
    rng = np.random.default_rng(3)
    nrow, nchan, npol = 12, 3, 4
    ant1 = np.array([0, 0, 0, 1, 1, 2] * 2)
    ant2 = np.array([1, 2, 3, 2, 3, 3] * 2)
    uvw = rng.uniform(-100, 100, (nrow, 3))
    data = (rng.normal(size=(nrow, nchan, npol))
            + 1j * rng.normal(size=(nrow, nchan, npol))).astype(np.complex64)
    flag = np.zeros((nrow, nchan, npol), bool)
    flag[0, 1, :] = True
    weight = np.ones((nrow, npol), np.float32) * 2

    tables = {
        "main": FakeTable({
            "ANTENNA1": ant1, "ANTENNA2": ant2,
            "FIELD_ID": np.zeros(nrow, int),
            "UVW": uvw, "DATA": data, "FLAG": flag,
            "FLAG_ROW": np.zeros(nrow, bool),
            "WEIGHT": weight,
        }, nrow),
        "ANTENNA": FakeTable({
            "POSITION": np.array([[0, 0, 0], [100, 0, 0],
                                  [0, 200, 0], [50, 50, 0]], float),
            "DISH_DIAMETER": np.full(4, 13.5),
        }, 4),
        "SPECTRAL_WINDOW": FakeTable({
            "CHAN_FREQ": np.array([[1.0e9, 1.1e9, 1.2e9]]),
        }, 1),
        "FIELD": FakeTable({
            "PHASE_DIR": np.array([[[0.5, -0.6]]]),
        }, 1),
        "POLARIZATION": FakeTable({
            "CORR_TYPE": np.array([[polarization.STOKES_XX,
                                    polarization.STOKES_XY,
                                    polarization.STOKES_YX,
                                    polarization.STOKES_YY]]),
        }, 1),
        "DATA_DESCRIPTION": FakeTable({
            "SPECTRAL_WINDOW_ID": np.array([0]),
            "POLARIZATION_ID": np.array([0]),
        }, 1),
    }

    def table(name, ack=False, **kwargs):
        if "::" in name:
            return tables[name.split("::")[1]]
        return tables["main"]

    fake_tables = types.SimpleNamespace(table=table)
    fake_casacore = types.ModuleType("casacore")
    fake_casacore.tables = fake_tables
    monkeypatch.setitem(sys.modules, "casacore", fake_casacore)
    monkeypatch.setitem(sys.modules, "casacore.tables", fake_tables)

    ms_dir = tmp_path / "fake.ms"
    ms_dir.mkdir()
    return str(ms_dir), data, weight, flag


class TestLoaderMS:
    def test_metadata(self, fake_ms):
        from katsdpimager_tpu.loader_ms import LoaderMS

        path, data, weight, flag = fake_ms
        loader = LoaderMS(path, [])
        assert loader.num_channels() == 3
        assert loader.frequency(1) == 1.1e9
        assert loader.longest_baseline() == pytest.approx(
            np.linalg.norm([100, -200, 0]))
        assert loader.antenna_diameter() == 13.5
        assert loader.phase_centre() == (0.5, -0.6)
        assert loader.polarizations() == [polarization.STOKES_XX,
                                          polarization.STOKES_XY,
                                          polarization.STOKES_YX,
                                          polarization.STOKES_YY]

    def test_data_iter(self, fake_ms):
        from katsdpimager_tpu.loader_ms import LoaderMS

        path, data, weight, flag = fake_ms
        loader = LoaderMS(path, [])
        chunks = list(loader.data_iter(0, 3))
        assert len(chunks) == 1
        chunk = chunks[0]
        assert chunk["vis"].shape == (3, 12, 4)
        assert chunk["weights"].shape == (3, 12, 4)
        # flags become zero weights
        assert np.all(chunk["weights"][1, 0] == 0)
        assert np.all(chunk["weights"][0, 0] == 2)
        # channel range selection
        chunks = list(loader.data_iter(1, 2))
        assert chunks[0]["vis"].shape == (1, 12, 4)
        np.testing.assert_array_equal(chunks[0]["vis"][0],
                                      data[:, 1, :])

    def test_match(self):
        from katsdpimager_tpu.loader_ms import LoaderMS

        assert not LoaderMS.match("foo.h5")
        assert not LoaderMS.match("nonexistent.ms")


def test_uvw_sign_convention(fake_ms):
    """Default (casa) negates UVW relative to the MS column; strict keeps."""
    from katsdpimager_tpu.loader_ms import LoaderMS

    path, data, weight, flag = fake_ms
    casa = LoaderMS(path, [])
    strict = LoaderMS(path, ["--uvw=strict"])
    uvw_casa = next(casa.data_iter(0, 1))["uvw"]
    uvw_strict = next(strict.data_iter(0, 1))["uvw"]
    np.testing.assert_allclose(uvw_casa, -uvw_strict)


def test_pol_frame_feed_rejected(fake_ms):
    from katsdpimager_tpu.loader_ms import LoaderMS

    path, *_ = fake_ms
    with pytest.raises(NotImplementedError):
        LoaderMS(path, ["--pol-frame=feed"])
