"""E2E coverage of the remaining imaging modes: degridding prediction,
continuum subtraction, primary-beam correction and double precision."""

import numpy as np
import pytest

from katsdpimager_tpu import simulate
from tests.test_e2e import run_capture, truth_restored


@pytest.fixture(scope="module")
def sim_dataset(tmp_path_factory):
    path = tmp_path_factory.mktemp("sim") / "tiny.h5"
    simulate.make_sim_dataset(str(path), num_antennas=16, num_times=24,
                              num_channels=1, max_radius=800.0)
    return str(path)


def test_degrid_mode(sim_dataset):
    """Degridding-based major cycles converge like direct prediction."""
    cap = run_capture(sim_dataset, [
        sim_dataset, "/tmp/x_%c.fits", "--stokes", "I",
        "--pixels", "512", "--major", "2", "--minor", "200",
        "--loop-gain", "0.25", "--clean-mode", "I", "--kernel-width", "16",
        "--degrid",
    ])
    image = cap["clean"]
    rb = cap["stats"]["restoring_beam"]
    expected = truth_restored(cap["image_p"], 1, rb)
    # Degridding is less accurate than direct prediction (same caveat as
    # the reference's --degrid flag).
    for src in simulate.DEFAULT_SOURCES:
        ra0, dec0 = simulate.DEFAULT_PHASE_CENTRE
        l, m, _ = simulate.lmn(np.array([src.ra]), np.array([src.dec]),
                               ra0, dec0)
        px = int(round(256 + l[0] / cap["image_p"].pixel_size))
        py = int(round(256 + m[0] / cap["image_p"].pixel_size))
        got = image[0, py - 2:py + 3, px - 2:px + 3].max()
        want = expected[0, py - 2:py + 3, px - 2:px + 3].max()
        assert got == pytest.approx(want, rel=0.15), (src, got, want)


def test_subtract_sky_model(sim_dataset, tmp_path):
    """--subtract removes a known source before imaging."""
    lsm = tmp_path / "lsm.txt"
    # subtract the brightest off-centre source (1.5 Jy at 52.625, -35.1167)
    lsm.write_text("52.625 -35.1167 1.5 0 0 0\n")
    cap = run_capture(sim_dataset, [
        sim_dataset, "/tmp/x_%c.fits", "--stokes", "I",
        "--pixels", "512", "--major", "1", "--minor", "100",
        "--kernel-width", "16", "--subtract", str(lsm),
    ])
    image = cap["clean"]
    ra0, dec0 = simulate.DEFAULT_PHASE_CENTRE
    src = simulate.DEFAULT_SOURCES[1]
    l, m, _ = simulate.lmn(np.array([src.ra]), np.array([src.dec]), ra0, dec0)
    px = int(round(256 + l[0] / cap["image_p"].pixel_size))
    py = int(round(256 + m[0] / cap["image_p"].pixel_size))
    # The subtracted source must be (nearly) gone
    residual_peak = image[0, py - 2:py + 3, px - 2:px + 3].max()
    assert residual_peak < 0.3
    # but the phase-centre source remains
    assert image[0, 256, 256] > 0.7


def test_double_precision(sim_dataset):
    import jax

    try:
        jax.config.update("jax_enable_x64", True)
        cap = run_capture(sim_dataset, [
            sim_dataset, "/tmp/x_%c.fits", "--stokes", "I",
            "--pixels", "256", "--major", "1", "--minor", "50",
            "--kernel-width", "12", "--precision", "double",
        ])
        assert cap["clean"].dtype == np.float64
        assert np.isfinite(cap["clean"]).all()
    finally:
        jax.config.update("jax_enable_x64", False)


def test_primary_beam_correction(sim_dataset):
    """--primary-beam divides by the beam power and blanks the cutoff
    region with NaN (Airy fallback for the simulated band)."""
    cap = run_capture(sim_dataset, [
        sim_dataset, "/tmp/x_%c.fits", "--stokes", "I",
        "--pixels", "512", "--major", "1", "--minor", "100",
        "--kernel-width", "16", "--primary-beam", "meerkat",
        "--primary-beam-cutoff", "0.3",
    ])
    image = cap["clean"]
    # centre unchanged (beam power 1); far-out pixels blanked
    assert np.isfinite(image[0, 256, 256])
    assert image[0, 256, 256] > 0.5
    corners = [image[0, 2, 2], image[0, -3, -3]]
    assert all(np.isnan(c) for c in corners)
    # between: corrected values are boosted relative to the uncorrected run
    cap0 = run_capture(sim_dataset, [
        sim_dataset, "/tmp/x_%c.fits", "--stokes", "I",
        "--pixels", "512", "--major", "1", "--minor", "100",
        "--kernel-width", "16",
    ])
    img0 = cap0["clean"]
    ring = np.isfinite(image[0]) & (np.abs(img0[0]) > 1e-3)
    ratio = np.abs(image[0][ring]) / np.abs(img0[0][ring])
    # Division by power <= 1 boosts values; the model path and restore
    # differ slightly between runs, so require the bulk statistic.
    assert np.median(ratio) >= 1.0


def test_vis_block_streaming_invariance(sim_dataset):
    """Imaging with a tiny --vis-block (many streamed blocks, per-block
    chunk plans) reproduces the single-block result to reassociation
    tolerance (gridding is additive)."""
    from tests.test_e2e import run_capture

    argv = [sim_dataset, "/tmp/ignored_%c.fits", "--pixels", "256",
            "--kernel-width", "12", "--major", "1", "--minor", "50"]
    full = run_capture(sim_dataset, argv)
    blocked = run_capture(sim_dataset, argv + ["--vis-block", "701"])
    a, b = full["clean"], blocked["clean"]
    peak = np.abs(a).max()
    # f32 gridding reassociation (~1e-7 grid-level) is FFT-amplified to
    # ~3e-4 of peak (see test_accuracy_gate) and CLEAN's thresholded
    # component selection can amplify slightly further.
    assert np.abs(a - b).max() < 1e-3 * peak
