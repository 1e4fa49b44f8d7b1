"""CLEAN tests: on-device minor cycles vs a numpy step-by-step oracle
(strategy mirrors reference test_clean.py including edge-clipped PSF and
zero-noise cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from katsdpimager_tpu.ops import clean


def numpy_minor_cycle(image, model, psf_patch_arr, mode, loop_gain,
                      border_pixels):
    """One reference minor cycle (mirrors reference CleanHost semantics:
    clipped subtraction at edges)."""
    N = image.shape[1]
    interior = image[:, border_pixels:N - border_pixels,
                     border_pixels:N - border_pixels]
    if mode == clean.CLEAN_I:
        metric = np.abs(interior[0])
    else:
        metric = np.sum(interior ** 2, axis=0)
    idx = np.unravel_index(np.argmax(metric), metric.shape)
    peak = metric[idx]
    py, px = idx[0] + border_pixels, idx[1] + border_pixels
    scale = loop_gain * image[:, py, px]
    ph, pw = psf_patch_arr.shape[1:]
    y0, x0 = py - ph // 2, px - pw // 2
    y1, x1 = y0 + ph, x0 + pw
    sy0, sx0 = max(0, -y0), max(0, -x0)
    sy1 = ph - max(0, y1 - N)
    sx1 = pw - max(0, x1 - N)
    image[:, max(0, y0):min(N, y1), max(0, x0):min(N, x1)] -= (
        scale[:, None, None] * psf_patch_arr[:, sy0:sy1, sx0:sx1])
    model[:, py, px] += scale
    return peak, (py, px)


def make_psf(pixels, pols, rng):
    """Synthetic PSF: peak 1 at centre with random sidelobes."""
    psf = rng.normal(scale=0.05, size=(pols, pixels, pixels)).astype(np.float32)
    y = np.exp(-0.5 * ((np.arange(pixels) - pixels // 2) / 2.0) ** 2)
    psf += np.outer(y, y)[None] * 0.8
    psf[:, pixels // 2, pixels // 2] = 1.0
    return psf


@pytest.mark.parametrize("mode", [clean.CLEAN_I, clean.CLEAN_SUMSQ])
@pytest.mark.parametrize("border", [0, 4])
def test_minor_cycles_match_oracle(mode, border):
    rng = np.random.default_rng(12)
    pixels, pols = 96, 2
    psf = make_psf(pixels, pols, rng)
    patch = (pols, 31, 31)
    mid = pixels // 2
    psf_patch_arr = psf[:, mid - 15:mid + 16, mid - 15:mid + 16].copy()

    dirty = rng.normal(scale=0.1, size=(pols, pixels, pixels)).astype(np.float32)
    # a few sources
    for (y, x, f) in [(30, 40, 5.0), (60, 20, 3.0), (48, 70, 4.0)]:
        dirty[:, y, x] += f

    cfg = clean.CleanConfig(pixels=pixels, num_pols=pols,
                            border_pixels=border, patch_y=31, patch_x=31,
                            mode=mode, loop_gain=0.25)
    state = clean.make_state(cfg, jnp.asarray(dirty),
                             jnp.zeros_like(jnp.asarray(dirty)))

    img = dirty.astype(np.float64).copy()
    mdl = np.zeros_like(img)
    cycles = 12
    peaks = []
    for _ in range(cycles):
        peak, _pos = numpy_minor_cycle(img, mdl, psf_patch_arr, mode, 0.25, border)
        peaks.append(peak)

    state, k, first_peak, _last = clean.minor_cycles(
        cfg, state, jnp.asarray(psf_patch_arr), jnp.float32(0.0), cycles)
    assert int(k) == cycles
    assert float(first_peak) == pytest.approx(peaks[0], rel=1e-5)
    res = np.asarray(clean.residual_image(cfg, state))
    np.testing.assert_allclose(res, img, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.model), mdl, rtol=1e-4, atol=1e-6)


def test_threshold_stops():
    pixels, pols = 64, 1
    dirty = np.zeros((pols, pixels, pixels), np.float32)
    dirty[0, 20, 20] = 1.0
    dirty[0, 40, 40] = 0.3
    psf_patch_arr = np.zeros((pols, 5, 5), np.float32)
    psf_patch_arr[0, 2, 2] = 1.0

    cfg = clean.CleanConfig(pixels=pixels, num_pols=pols, border_pixels=0,
                            patch_y=5, patch_x=5, mode=clean.CLEAN_I,
                            loop_gain=1.0)
    state = clean.make_state(cfg, jnp.asarray(dirty),
                             jnp.zeros_like(jnp.asarray(dirty)))
    state, k, first, last = clean.minor_cycles(
        cfg, state, jnp.asarray(psf_patch_arr), jnp.float32(0.5), 100)
    # Only the 1.0 peak is above threshold; loop_gain 1 removes it entirely.
    assert int(k) == 1
    assert float(first) == pytest.approx(1.0)
    assert float(last) == pytest.approx(0.3)
    res = np.asarray(clean.residual_image(cfg, state))
    assert res[0, 20, 20] == pytest.approx(0.0)
    assert res[0, 40, 40] == pytest.approx(0.3)


def test_edge_subtraction_clipped():
    """Peak near the image edge: the PSF window sticks out; the visible
    residual must match the oracle's clipped subtraction."""
    pixels, pols = 64, 1
    dirty = np.zeros((pols, pixels, pixels), np.float32)
    dirty[0, 1, 1] = 2.0
    psf_patch_arr = np.full((pols, 9, 9), 0.1, np.float32)
    psf_patch_arr[0, 4, 4] = 1.0

    cfg = clean.CleanConfig(pixels=pixels, num_pols=pols, border_pixels=0,
                            patch_y=9, patch_x=9, mode=clean.CLEAN_I,
                            loop_gain=0.5)
    state = clean.make_state(cfg, jnp.asarray(dirty),
                             jnp.zeros_like(jnp.asarray(dirty)))
    img = dirty.astype(np.float64).copy()
    mdl = np.zeros_like(img)
    numpy_minor_cycle(img, mdl, psf_patch_arr, clean.CLEAN_I, 0.5, 0)

    state, k, _f, _l = clean.minor_cycles(
        cfg, state, jnp.asarray(psf_patch_arr), jnp.float32(0.0), 1)
    res = np.asarray(clean.residual_image(cfg, state))
    np.testing.assert_allclose(res, img, atol=1e-6)


class TestPsfPatch:
    def test_simple_box(self):
        psf = np.zeros((1, 64, 64), np.float32)
        psf[0, 32, 32] = 1.0
        psf[0, 30, 36] = 0.5
        assert clean.psf_patch(psf, 0.4) == (1, 5, 9)

    def test_limit(self):
        psf = np.full((1, 64, 64), 0.9, np.float32)
        box = clean.psf_patch(psf, 0.5, limit=0.5)
        assert box[1] <= 31 and box[2] <= 31

    def test_nothing_above(self):
        psf = np.zeros((1, 16, 16), np.float32)
        assert clean.psf_patch(psf, 0.5) == (1, 1, 1)


class TestNoiseEst:
    def test_gaussian(self):
        rng = np.random.default_rng(1)
        img = rng.normal(scale=2.0, size=(1, 256, 256)).astype(np.float32)
        est = float(clean.noise_est(jnp.asarray(img), border_pixels=8))
        assert est == pytest.approx(2.0, rel=0.05)


class TestThresholdScale:
    def test_modes(self):
        assert clean.noise_threshold_scale(clean.CLEAN_I, 5.0, 4) == 5.0
        s = clean.noise_threshold_scale(clean.CLEAN_SUMSQ, 5.0, 4)
        assert s > 5.0  # chi^2 with 4 dof needs a higher bar
        # and must recover the same tail probability
        import scipy.stats
        p = 2 * scipy.stats.norm.sf(5.0)
        assert scipy.stats.chi2.sf(s ** 2, 4) == pytest.approx(p, rel=1e-6)

    def test_metric_power(self):
        assert clean.metric_to_power(clean.CLEAN_SUMSQ, 9.0) == 3.0
        assert clean.power_to_metric(clean.CLEAN_SUMSQ, 3.0) == 9.0
        assert clean.metric_to_power(clean.CLEAN_I, 3.0) == 3.0

    def test_matches_numpy_median(self):
        """The rank-binary-search median equals numpy's exactly (even and
        odd interior sizes)."""
        for n, border in ((64, 8), (65, 16)):
            rng = np.random.default_rng(n)
            img = rng.normal(scale=1.3, size=(1, n, n)).astype(np.float32)
            est = float(clean.noise_est(jnp.asarray(img),
                                        border_pixels=border))
            interior = np.abs(img[:, border:n - border, border:n - border])
            expect = (float(np.median(interior))
                      * clean._MEDIAN_TO_RMS)
            assert est == pytest.approx(expect, rel=1e-6)
