r"""Grid <-> image transforms: FFT plus fused taper / n / W-phase corrections.

Replaces the reference's cuFFT plans plus ``layer_to_image.mako`` /
``image_to_layer.mako`` kernels (``image.py``) with XLA FFTs and fused
elementwise math.  The measurement equation convention is

.. math:: V(u, v, w) = \int \frac{I(l, m)}{n} e^{-2\pi i(ul + vm + w(n-1))}\,dl\,dm

(reference image.py:55-63).  ``grid_to_image`` therefore:

- inverse-FFTs the (fftshifted) grid, unnormalized to match the reference's
  cuFFT scaling (image.py:787-789);
- multiplies by the per-slice W correction :math:`e^{2\pi i w(n-1)}` and
  keeps the real part;
- multiplies by :math:`n = \sqrt{1 - l^2 - m^2}` and divides by the
  separable anti-aliasing taper;
- accumulates into the W-stacked image.

``image_to_grid`` divides by taper and ``n`` (division in both directions is
deliberate: the taper transform is convolved in on both paths, reference
image.py:39-43) and applies the conjugate W phase.

All elementwise factors are fused by XLA into the FFT's neighbourhood; the
fftshifts are XLA rolls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _lm_grids(pixels: int, pixel_size, dtype):
    """Return (n - 1) and n over the *unshifted* (corner-centred) layer
    layout, plus the centred taper-normalisation layout handled separately.

    lm(x) = lm_scale * x + lm_bias with lm_scale = pixel_size and
    lm_bias = -pixels/2 * pixel_size (reference imaging.py:90-91).
    """
    pixel_size = jnp.asarray(pixel_size, dtype)
    lm = (jnp.arange(pixels, dtype=dtype) * pixel_size
          - 0.5 * pixels * pixel_size)
    lm = jnp.fft.ifftshift(lm)
    lm2 = lm * lm
    n = jnp.sqrt(1.0 - (lm2[:, None] + lm2[None, :]))
    return n


def grid_to_image_impl(grid, image, kernel1d, w, pixel_size, *, pixels: int):
    """IFFT the grid and accumulate the W-corrected layer into ``image``.

    grid: (P, N, N) complex; image: (P, N, N) real (donated, accumulated);
    kernel1d: (N,) taper samples; w: scalar mid-w of the slice in wavelengths.
    """
    rdtype = image.dtype
    layer = jnp.fft.ifft2(jnp.fft.ifftshift(grid, axes=(-2, -1)), axes=(-2, -1))
    scale = pixels * pixels  # match unnormalized cuFFT inverse
    n = _lm_grids(pixels, pixel_size, rdtype)
    phase = (2 * jnp.pi) * w * (n - 1.0)
    rotated = layer.real * jnp.cos(phase) - layer.imag * jnp.sin(phase)
    contrib = rotated * (n * scale)
    contrib = jnp.fft.fftshift(contrib, axes=(-2, -1))
    taper2 = jnp.outer(kernel1d, kernel1d).astype(rdtype)
    return image + (contrib / taper2).astype(rdtype)


#: Jitted single-channel entry point (image buffer donated).
grid_to_image = partial(jax.jit, static_argnames=("pixels",),
                        donate_argnums=(1,))(grid_to_image_impl)


def image_to_grid_impl(image, kernel1d, w, pixel_size, *, pixels: int):
    """Forward transform of ``grid_to_image`` (for degridding prediction).

    Returns the (P, N, N) complex grid with centre at the middle.
    """
    rdtype = image.dtype
    n = _lm_grids(pixels, pixel_size, rdtype)
    taper2 = jnp.outer(kernel1d, kernel1d).astype(rdtype)
    taper2 = jnp.fft.ifftshift(taper2, axes=(-2, -1))
    layer_shifted = jnp.fft.ifftshift(image, axes=(-2, -1)) / (taper2 * n)
    phase = (-2 * jnp.pi) * w * (n - 1.0)
    layer = layer_shifted * (jnp.cos(phase) + 1j * jnp.sin(phase))
    grid = jnp.fft.fft2(layer, axes=(-2, -1))
    return jnp.fft.fftshift(grid, axes=(-2, -1))


#: Jitted single-channel entry point.
image_to_grid = partial(jax.jit, static_argnames=("pixels",))(image_to_grid_impl)


@jax.jit
def scale_image(image, scale):
    """Per-polarization scalar multiply (reference scale.mako)."""
    return image * scale[:, None, None]


@jax.jit
def add_image(dest, src):
    return dest + src


@jax.jit
def apply_primary_beam(image, beam_power, cutoff, replacement):
    """Divide by the primary-beam power, replacing pixels below ``cutoff``
    (NaN for sky images, 0 for model images; reference
    apply_primary_beam.mako / image.py:497)."""
    return jnp.where(beam_power[None] >= cutoff, image / beam_power[None],
                     replacement)


def grid_to_image_reference(grid, image, kernel1d, w, pixel_size):
    """Numpy oracle mirroring reference GridToImageHost (image.py:743-800)."""
    import numpy as np

    pixels = image.shape[-1]
    layer = np.fft.ifft2(np.fft.ifftshift(grid, axes=(-2, -1)), axes=(-2, -1))
    scale = pixels * pixels
    lm = np.arange(pixels) * pixel_size - 0.5 * pixels * pixel_size
    lm = np.fft.ifftshift(lm)
    lm2 = lm * lm
    n = np.sqrt(1 - (lm2[:, None] + lm2[None, :]))
    layer = layer * np.exp(2j * np.pi * w * (n - 1))
    out = layer.real * scale * n[None]
    out = np.fft.fftshift(out, axes=(-2, -1))
    out = out / np.outer(kernel1d, kernel1d)[None]
    return image + out
