"""katdal loader against a fake MVFv4-style dataset.

Mirrors the reference's fake-backend strategy
(``test/test_loader_katdal.py:47-120``: in-memory telstate + mocked
``katdal.open``) using the loader's :data:`dataset_opener` seam.  The
physics test images a simulated point-source observation end-to-end
through the CLI to a captured image and asserts flux recovery.
"""

import math
import types

import numpy as np
import pytest

from katsdpimager_tpu import (arguments, ephem, frontend,
                              imager as imager_cli, loader, loader_katdal,
                              polarization, sky_model)
from katsdpimager_tpu.units import C_M_PER_S

TARGET = ("PKS 1934-63, radec target, 19:39:25.03, -63:42:45.7, "
          "(200.0 12000.0 -11.11 7.777 -1.231)")
BPCAL = "cal source, radec bpcal, 10:00:00.0, -30:00:00.0"
COMPONENTS = [
    "src0, radec, 19:39:25.03, -63:42:45.7, (200.0 12000.0 0.0)",
    "src1, radec, 19:40:00.00, -63:40:00.0, (200.0 12000.0 0.30103)",
]

SITE_LAT = math.radians(-30.713)
SITE_LON = math.radians(21.444)


class FakeCatalogue:
    def __init__(self, targets):
        self.targets = [sky_model.KatpointTarget(t) if isinstance(t, str)
                        else t for t in targets]

    def __iter__(self):
        return iter(self.targets)

    def __len__(self):
        return len(self.targets)


class FakeDataset:
    """Implements the dataset protocol documented in loader_katdal."""

    def __init__(self, num_ants=4, num_times=8, num_channels=6,
                 target=TARGET, sources=None, drop_products=(),
                 channel_mask=None, start_time=1.7e9, dump_period=8.0):
        rng = np.random.default_rng(11)
        self.ants = []
        site = ephem.geodetic_to_ecef(SITE_LAT, SITE_LON, 1086.6)
        rot = ephem.enu_to_ecef_matrix(SITE_LAT, SITE_LON)
        for i in range(num_ants):
            enu = rng.uniform(-300, 300, size=3) * [1, 1, 0.01]
            self.ants.append(types.SimpleNamespace(
                name=f"m{i:03}", diameter=13.5,
                position_ecef=site + rot @ enu))
        self.catalogue = FakeCatalogue([BPCAL, target])
        self.spectral_windows = [types.SimpleNamespace(band="l",
                                                       product="c856M1k")]
        self.freqs = 1284e6 + 1e6 * np.arange(num_channels)
        self.dump_period = dump_period
        self.start_time = start_time
        self.timestamps = start_time + self.dump_period * (
            np.arange(num_times) + 0.5)
        self.observer = "Kim"
        self.source = types.SimpleNamespace(
            telstate={}, capture_block_id="1234567890",
            stream_name="sdp_l0")
        self.select_calls = []

        # corr products: all cross+auto pairs x (hh, hv, vh, vv), minus
        # any dropped, in scrambled order to exercise the permutation
        products = []
        for a in range(num_ants):
            for b in range(a, num_ants):
                for pa in "hv":
                    for pb in "hv":
                        products.append((f"m{a:03}{pa}", f"m{b:03}{pb}"))
        products = [p for p in products if p not in drop_products]
        rng.shuffle(products)
        self.corr_products = np.asarray(products)

        T, C, CP = num_times, num_channels, len(products)
        self.shape = (T, C, CP)
        self.flags = np.zeros((T, C, CP), bool)
        self.weights = np.ones((T, C, CP), np.float32)
        if channel_mask is not None:
            self.source.telstate["model_rfi_mask_fixed"] = channel_mask

        # Physically consistent visibilities for I-only point sources:
        # V(XX) = V(YY) = sum_s S_s exp(-2 pi i uvw . lmn1 / lambda)
        self.vis = np.zeros((T, C, CP), np.complex64)
        if sources:
            tgt = sky_model.KatpointTarget(target)
            positions = np.stack([a.position_ecef for a in self.ants])
            ant_uvw = ephem.antenna_uvw(positions, tgt.ra, tgt.dec,
                                        self.timestamps,
                                        apparent=True)  # (A, T, 3)
            name_to_idx = {a.name: i for i, a in enumerate(self.ants)}
            lmn1 = []
            flux = []
            for ra, dec, s in sources:
                l = np.cos(dec) * np.sin(ra - tgt.ra)
                m = (np.sin(dec) * np.cos(tgt.dec)
                     - np.cos(dec) * np.sin(tgt.dec) * np.cos(ra - tgt.ra))
                n = np.sqrt(1 - l * l - m * m)
                lmn1.append((l, m, n - 1))
                flux.append(s)
            lmn1 = np.asarray(lmn1)          # (S, 3)
            flux = np.asarray(flux)          # (S,)
            for cp, (ia, ib) in enumerate(self.corr_products):
                a, b = name_to_idx[ia[:-1]], name_to_idx[ib[:-1]]
                pol = ia[-1] + ib[-1]
                if pol not in ("hh", "vv"):
                    continue
                uvw = ant_uvw[b] - ant_uvw[a]     # (T, 3)
                for c, freq in enumerate(self.freqs):
                    phase = uvw @ lmn1.T / (C_M_PER_S / freq)  # (T, S)
                    self.vis[:, c, cp] = (
                        np.exp(-2j * np.pi * phase) @ flux)

    def select(self, **kwargs):
        self.select_calls.append(kwargs)

    @property
    def sensor(self):
        return None


@pytest.fixture
def fake_open(monkeypatch):
    holder = {}

    def opener(filename, **kwargs):
        holder["open_kwargs"] = kwargs
        return holder["dataset"]

    monkeypatch.setattr(loader_katdal, "dataset_opener", opener)
    return holder


def make_loader(holder, dataset, options=()):
    holder["dataset"] = dataset
    return loader_katdal.LoaderKatdal("fake.rdb", list(options))


def test_match():
    assert loader_katdal.LoaderKatdal.match("obs.rdb")
    assert loader_katdal.LoaderKatdal.match(
        "redis://host/1234?token=abcd")
    assert not loader_katdal.LoaderKatdal.match("obs.ms")


def test_properties(fake_open):
    ldr = make_loader(fake_open, FakeDataset())
    assert ldr.num_channels() == 6
    assert ldr.frequency(2) == 1286e6
    assert ldr.band() == "l"
    np.testing.assert_allclose(ldr.antenna_diameters(), 13.5)
    assert ldr.antenna_diameter() == 13.5
    assert ldr.longest_baseline() > 0
    assert ldr.has_feed_angles()
    assert ldr.weight_scale() == pytest.approx(math.sqrt(0.5))
    # auto target selection picked the 'target'-tagged one, not the bpcal
    assert ldr.raw_target.name == "PKS 1934-63"
    ra, dec = ldr.phase_centre()
    assert ra == pytest.approx(
        (19 + 39 / 60 + 25.03 / 3600) / 24 * 2 * math.pi)
    assert dec == pytest.approx(-math.radians(63 + 42 / 60 + 45.7 / 3600))
    assert ldr.polarizations() == [
        polarization.STOKES_XX, polarization.STOKES_XY,
        polarization.STOKES_YX, polarization.STOKES_YY]
    # selection requested track scans on cross products
    assert fake_open["dataset"].select_calls[0]["scans"] == ["track"]


def test_target_selection(fake_open):
    ldr = make_loader(fake_open, FakeDataset(), ["--target=0"])
    assert ldr.raw_target.name == "cal source"
    ldr = make_loader(fake_open, FakeDataset(),
                      ["--target=PKS 1934-63"])
    assert ldr.raw_target.name == "PKS 1934-63"
    with pytest.raises(ValueError):
        make_loader(fake_open, FakeDataset(), ["--target=nope"])
    with pytest.raises(ValueError):
        make_loader(fake_open, FakeDataset(), ["--target=7"])
    # command-line options round-trip for provenance
    opts = make_loader(fake_open, FakeDataset(),
                       ["--target=0"]).command_line_options()
    assert opts == ["-i", "target=0"]


def test_data_iter_shapes_and_weights(fake_open):
    ds = FakeDataset(num_ants=3, num_times=4, num_channels=5)
    ds.flags[1, 2, :] = True
    ldr = make_loader(fake_open, ds)
    chunks = list(ldr.data_iter(1, 4, max_chunk_vis=None))
    assert len(chunks) == 1
    chunk = chunks[0]
    n_bl = 3  # 3 antennas -> 3 cross baselines
    n = n_bl * 4
    assert chunk["vis"].shape == (3, n, 4)
    assert chunk["weights"].shape == (3, n, 4)
    assert chunk["uvw"].shape == (n, 3)
    assert chunk["feed_angle1"].shape == (n,)
    assert chunk["progress"] == chunk["total"] == 4
    # flags became zero weights: channel 2 (global) is local index 1
    w = chunk["weights"].reshape(3, n_bl, 4, 4)  # (c, bl, t, p)
    assert (w[1, :, 1, :] == 0).all()
    assert (w[1, :, 0, :] == 1).all()
    # uvw = position2 - position1 consistency with our own ephemeris
    # feed angles are parallactic angle - pi/2 and within [-pi, pi)
    assert np.isfinite(chunk["feed_angle1"]).all()


def test_missing_products_flagged(fake_open):
    ds = FakeDataset(num_ants=3, drop_products=(("m000h", "m001v"),))
    ldr = make_loader(fake_open, ds)
    chunk = next(iter(ldr.data_iter(0, 1)))
    w = chunk["weights"][0].reshape(3, -1, 4)  # (bl, t, pol)
    # baseline (m000, m001) is first (sorted); pol hv is index 1
    assert (w[0, :, 1] == 0).all()
    assert (w[0, :, 0] == 1).all()
    assert (w[1:] == 1).all()


def test_channel_mask(fake_open):
    mask = np.array([False, True, False, False, True, False])
    ds = FakeDataset(channel_mask=mask)
    ldr = make_loader(fake_open, ds, ["--rfi-mask=fixed"])
    assert ldr.channel_enabled(0)
    assert not ldr.channel_enabled(1)
    chunk = next(iter(ldr.data_iter(0, 6)))
    w = chunk["weights"]
    assert (w[1] == 0).all()
    assert (w[4] == 0).all()
    assert (w[0] == 1).all()


def test_extra_fits_headers(fake_open):
    ldr = make_loader(fake_open, FakeDataset())
    headers = ldr.extra_fits_headers()
    assert headers["OBJECT"] == "PKS 1934-63"
    assert headers["SPECSYS"] == "TOPOCENT"
    assert headers["DATE-OBS"].startswith("2023-11-14T")
    assert headers["ONTIME"][0] == pytest.approx(8 * 8.0)
    assert headers["OBSERVER"] == "Kim"
    assert headers["INSTRUME"] == "c856M1k"
    assert abs(headers["OBSGEO-Z"]) > 1e6
    assert any("1234567890" in h for h in headers["HISTORY"])


def test_sky_model_from_telstate(fake_open):
    ds = FakeDataset()
    ts = ds.source.telstate
    ts["sdp_archived_streams"] = ["sdp_l0", "continuum_image"]
    ts["continuum_image_stream_type"] = "sdp.continuum_image"
    ts["1234567890_continuum_image_targets"] = {TARGET: "PKS_1934_63"}
    ts["1234567890_continuum_image_PKS_1934_63_target0_clean_components"] \
        = {"description": TARGET, "components": COMPONENTS}
    ldr = make_loader(fake_open, ds)
    model = ldr.sky_model()
    assert len(model.targets) == 2
    flux = model.flux_density(C_M_PER_S / 1284e6)
    np.testing.assert_allclose(flux[:, 0], [1.0, 2.0], rtol=1e-6)
    # no model -> NoSkyModelError
    ds2 = FakeDataset()
    ldr2 = make_loader(fake_open, ds2)
    with pytest.raises(sky_model.NoSkyModelError):
        ldr2.sky_model()


def test_image_end_to_end(fake_open, tmp_path):
    """Image a fake observation of a 1.4 Jy point source at the phase
    centre plus a 0.9 Jy source offset in declination; assert recovered
    fluxes AND the offset source's position (catches u/v/w sign-convention
    errors the centre source cannot)."""
    tgt = sky_model.KatpointTarget(TARGET)
    ddec = math.radians(0.08)
    sources = [(tgt.ra, tgt.dec, 1.4),
               (tgt.ra, tgt.dec + ddec, 0.9)]
    # a 1.6-hour track for real rotation synthesis (decent PSF)
    ds = FakeDataset(num_ants=8, num_times=48, num_channels=1,
                     sources=sources, dump_period=120.0)

    parser = imager_cli.get_parser()
    args = parser.parse_args(
        ["fake.rdb", str(tmp_path / "out_%c.fits"), "--host",
         "--pixels", "256", "--kernel-width", "12", "--major", "1",
         "--minor", "40", "--loop-gain", "0.3", "--stop-channel", "1"],
        namespace=arguments.SmartNamespace())
    cap = {}

    class CaptureWriter(frontend.Writer):
        def needs_fits_image(self, name):
            return name == "clean"

        def needs_fits_grid(self, name):
            return False

        def write_fits_image(self, name, desc, dataset, image, ip, ch,
                             beam=None, bunit=None):
            cap["clean"] = np.asarray(image).copy()
            cap["image_p"] = ip

        def write_fits_grid(self, *a, **k):
            pass

        def statistics(self, dataset, channel, **kwargs):
            cap["stats"] = kwargs

    fake_open["dataset"] = ds
    dataset = loader.load("fake.rdb", [])
    try:
        frontend.run(args, dataset, CaptureWriter())
    finally:
        dataset.close()

    image = cap["clean"]
    n = image.shape[-1]
    peak = image[0, n // 2, n // 2]
    assert peak == pytest.approx(1.4, rel=0.05)
    assert cap["stats"]["compressed_vis"] > 0
    # offset source at m = +ddec (l = 0): expected at pixel row
    # N/2 + m/pixel_size (same orientation as tests/test_e2e.py truth)
    ip = cap["image_p"]
    m = (math.sin(tgt.dec + ddec) * math.cos(tgt.dec)
         - math.cos(tgt.dec + ddec) * math.sin(tgt.dec))
    py = n // 2 + m / ip.pixel_size
    win = image[0, n // 2 + 8:, :]  # away from the centre source
    iy, ix = np.unravel_index(np.argmax(win), win.shape)
    assert abs((iy + n // 2 + 8) - py) <= 2
    assert abs(ix - n // 2) <= 2
    assert win[iy, ix] == pytest.approx(0.9, rel=0.1)


def test_timestamp_to_fits_rollover():
    """Fractional seconds that round to 1.000 roll into the seconds field
    instead of producing a malformed '...:59.1.000' stamp."""
    from katsdpimager_tpu.loader_katdal import _timestamp_to_fits

    assert _timestamp_to_fits(1590969599.9996) == "2020-06-01T00:00:00.000"
    assert _timestamp_to_fits(1590969600.0) == "2020-06-01T00:00:00.000"
    assert _timestamp_to_fits(1590969600.25) == "2020-06-01T00:00:00.250"
