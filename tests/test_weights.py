"""Imaging-weight tests vs closed-form / numpy oracle (strategy mirrors
reference test_weight.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from katsdpimager_tpu.ops import weights as w


def make_grid(rng, pols=2, pixels=64, n=200):
    uv = rng.integers(-20, 20, size=(n, 2)).astype(np.int16)
    wt = rng.uniform(0.5, 2.0, size=(n, pols)).astype(np.float32)
    return uv, wt


class TestGridWeights:
    def test_scatter_matches_numpy(self):
        rng = np.random.default_rng(0)
        pixels, pols = 64, 2
        uv, wt = make_grid(rng, pols, pixels)
        out = np.asarray(w.grid_weights(
            jnp.zeros((pols, pixels, pixels), jnp.float32),
            jnp.asarray(uv), jnp.asarray(wt), pixels=pixels))
        expected = np.zeros((pols, pixels, pixels), np.float32)
        for i in range(len(uv)):
            expected[:, uv[i, 1] + 32, uv[i, 0] + 32] += wt[i]
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestFinalize:
    @pytest.mark.parametrize("weight_type,robustness", [
        (w.WeightType.UNIFORM, 0.0),
        (w.WeightType.ROBUST, 0.0),
        (w.WeightType.ROBUST, 1.5),
        (w.WeightType.ROBUST, -1.0),
    ])
    def test_matches_oracle(self, weight_type, robustness):
        rng = np.random.default_rng(1)
        pixels, pols = 64, 2
        uv, wt = make_grid(rng, pols, pixels)
        weights_obj = w.Weights(weight_type, pols, pixels, robustness)
        weights_obj.clear()
        weights_obj.accumulate(uv, wt)
        grid_before = np.asarray(weights_obj.grid)
        rms, norm = weights_obj.finalize()

        d_exp, rms_exp, norm_exp = w.finalize_weights_reference(
            grid_before, weight_type, robustness)
        np.testing.assert_allclose(np.asarray(weights_obj.grid), d_exp, rtol=1e-5)
        assert rms == pytest.approx(float(rms_exp), rel=1e-5)
        assert norm == pytest.approx(float(norm_exp), rel=1e-5)

    def test_natural(self):
        weights_obj = w.Weights(w.WeightType.NATURAL, 1, 32)
        weights_obj.clear()
        rms, norm = weights_obj.finalize()
        assert rms is None
        assert norm == 1.0
        np.testing.assert_array_equal(np.asarray(weights_obj.grid), 1.0)

    def test_uniform_beam_shape(self):
        """Uniform weighting gives each occupied cell density weight 1/W."""
        pixels = 32
        uv = np.array([[0, 0], [0, 0], [5, 3]], np.int16)
        wt = np.array([[2.0], [3.0], [4.0]], np.float32)
        weights_obj = w.Weights(w.WeightType.UNIFORM, 1, pixels)
        weights_obj.accumulate(uv, wt)
        weights_obj.finalize()
        g = np.asarray(weights_obj.grid)
        assert g[0, 16, 16] == pytest.approx(1 / 5.0)
        assert g[0, 19, 21] == pytest.approx(1 / 4.0)
        assert g[0, 0, 0] == 0.0
