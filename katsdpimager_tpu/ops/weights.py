r"""Imaging-density weights: natural, uniform, robust (Briggs).

Math parity with the reference ``weight.py`` (equations from [Bri95]):

1. statistical weights are scatter-added onto a per-cell grid (no
   convolution);
2. robust weighting computes the mean weight :math:`\overline W =
   \sum W^2 / \sum W` over cells of the first polarization (eq 3.17);
3. cell weights become density weights ``d = 1 / (a W + b)`` with
   ``(a, b) = (1, 0)`` for uniform and ``(S^2, 1)`` for robust where
   :math:`S^2 = (5\cdot10^{-R})^2/\overline W` (wsclean's formulation);
   empty cells get ``d = 0``;
4. the thermal-RMS estimates returned are
   ``rms = sqrt(sum(d^2 W)) / sum(d W)`` and ``rms * sqrt(sum(W))``
   (eqs 3.3 and 3.5 with unit ΔS), over the first polarization.

Natural weighting fills the density grid with ones and reports
``(None, 1.0)``.
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class WeightType(enum.Enum):
    NATURAL = 0
    UNIFORM = 1
    ROBUST = 2


@partial(jax.jit, static_argnames=("pixels",), donate_argnums=(0,))
def grid_weights(weights_grid, uv, weights, *, pixels: int):
    """Scatter-add statistical weights at their (unconvolved) cells.

    weights_grid: (P, pixels, pixels) float32 (donated); uv: (N, 2) centred;
    weights: (N, P).  Padding entries must have zero weight.
    """
    half = pixels // 2
    uq = uv[:, 0].astype(jnp.int32) + half
    vq = uv[:, 1].astype(jnp.int32) + half
    return weights_grid.at[:, vq, uq].add(weights.T, mode="drop")


@jax.jit
def mean_weight(weights_grid):
    """Briggs eq 3.17 over the first polarization."""
    w = weights_grid[0]
    return jnp.sum(w * w) / jnp.sum(w)


@partial(jax.jit, donate_argnums=(0,))
def density_weights(weights_grid, a, b):
    """In-place ``W -> 1/(aW + b)`` (0 for empty cells) plus the RMS sums.

    Returns (new grid, rms, normalized_rms).
    """
    w0 = weights_grid[0]
    d = jnp.where(weights_grid > 0, 1.0 / (a * weights_grid + b), 0.0)
    d0 = d[0]
    sum_w = jnp.sum(w0)
    sum_dw = jnp.sum(d0 * w0)
    sum_d2w = jnp.sum(d0 * d0 * w0)
    rms = jnp.sqrt(sum_d2w) / sum_dw
    return d, rms, rms * jnp.sqrt(sum_w)


class Weights:
    """Stateful per-channel weight computation (parity with reference
    ``weight.py:379-538``).  Holds the density grid as a jnp array."""

    def __init__(self, weight_type: WeightType, num_polarizations: int,
                 pixels: int, robustness: float = 0.0, dtype=jnp.float32):
        self.weight_type = weight_type
        self.robustness = robustness
        self.pixels = pixels
        self.grid = jnp.zeros((num_polarizations, pixels, pixels), dtype)

    def clear(self):
        if self.weight_type != WeightType.NATURAL:
            self.grid = jnp.zeros_like(self.grid)

    def accumulate(self, uv, weights):
        if self.weight_type != WeightType.NATURAL:
            self.grid = grid_weights(self.grid, jnp.asarray(uv),
                                     jnp.asarray(weights), pixels=self.pixels)

    def finalize(self):
        """Convert summed weights to density weights; returns
        ``(rms, normalized_rms)``."""
        if self.weight_type == WeightType.NATURAL:
            self.grid = jnp.ones_like(self.grid)
            return None, 1.0
        if self.weight_type == WeightType.ROBUST:
            mw = mean_weight(self.grid)
            s2 = (5.0 * 10.0 ** (-self.robustness)) ** 2 / mw
            self.grid, rms, norm = density_weights(self.grid, s2, 1.0)
        else:  # UNIFORM
            self.grid, rms, norm = density_weights(self.grid, 1.0, 0.0)
        return float(rms), float(norm)


def finalize_weights_reference(weights_grid: np.ndarray, weight_type: WeightType,
                               robustness: float = 0.0):
    """Numpy oracle mirroring reference WeightsHost.finalize
    (weight.py:541-605)."""
    wg = weights_grid.copy()
    if weight_type == WeightType.NATURAL:
        return np.ones_like(wg), None, 1.0
    if weight_type == WeightType.UNIFORM:
        sum_w = np.sum(wg[0])
        sum_dw = np.count_nonzero(wg[0])
        wg[wg == 0] = np.inf
        d = 1.0 / wg
        sum_d2w = np.sum(d[0])
        rms = np.sqrt(sum_d2w) / sum_dw
        return d, rms, rms * np.sqrt(sum_w)
    # ROBUST
    sum_sq = np.dot(wg[0].ravel(), wg[0].ravel())
    total = np.sum(wg[0])
    mw = sum_sq / total
    s2 = (5.0 * 10.0 ** (-robustness)) ** 2 / mw
    old0 = wg[0].copy()
    wg[wg == 0] = np.inf
    d = 1.0 / (wg * s2 + 1)
    sum_w = np.sum(old0)
    sum_dw = np.sum(d[0] * old0)
    sum_d2w = np.sum(d[0] ** 2 * old0)
    rms = np.sqrt(sum_d2w) / sum_dw
    return d, rms, rms * np.sqrt(sum_w)
