r"""Combined anti-aliasing + W-projection convolution kernels.

Math parity with the reference's ``grid.py:136-423`` (Kaiser-Bessel window,
its continuous Fourier transform, the separable small-angle W term and the
image-space taper), but generated as plain arrays for upload once per
channel — there is no Mako/CUDA templating step to mirror.

Sampling/indexing conventions (shared with :mod:`..preprocess` and the
gridders):

- A kernel has support ``width`` UV cells and is tabulated at ``oversample``
  subpixel positions.  For a continuous (cell-unit) coordinate ``x``,
  ``xs = floor(x * oversample)``, ``pixel = xs // oversample``,
  ``subpixel = xs % oversample`` (reference grid.py:337-341).
- Tabulated values are at half-subpixel offsets (the centres of subpixel
  bins), implemented as a :math:`-\tfrac{1}{2}\text{cell}/\text{oversample}`
  shift in UV space (reference grid.py:258-261,314).
- The W term uses the separable small-angle approximation
  :math:`\sqrt{1-l^2-m^2}-1 \approx -\tfrac12(l^2+m^2)-\tfrac{5}{24}(l^4+m^4)`
  (reference grid.py:239-248).

One deliberate deviation: the per-plane kernel w values are spaced by
``max_w / ((w_slices - 0.5) * w_planes)`` — exactly the residual-w of the
quantisation in :mod:`..preprocess` — where the reference uses
``max_w / (w_slices * w_planes)`` (grid.py:369-383), a slight mismatch with
its own quantiser.
"""

from __future__ import annotations

import math

import numpy as np


def kaiser_bessel(x, width: float, beta: float):
    r"""Kaiser-Bessel window with support :math:`[-W/2, W/2]`."""
    x = np.asarray(x)
    param = 1 - (2 * x / width) ** 2
    # Clamp the sqrt argument; out-of-support values are zeroed below.
    values = np.i0(beta * np.sqrt(np.maximum(0.0, param))) / np.i0(beta)
    return np.where(param >= 0, values, 0.0)


def kaiser_bessel_fourier(f, width: float, beta: float):
    r"""Continuous Fourier transform of :func:`kaiser_bessel` (even + real,
    so also its own inverse transform)."""
    f = np.asarray(f, np.float64)
    alpha = beta / math.pi
    arg = (width * f) ** 2 - alpha * alpha
    # sinc of a purely imaginary argument is sinh-like; evaluate via complex
    # sqrt so negative arguments are handled without NaNs.
    root = np.sqrt(arg.astype(np.complex128))
    return width / np.i0(beta) * np.real(np.sinc(root))


def default_beta(width: float) -> float:
    """Shape parameter placing the first taper null just outside the image
    (the 1.2 factor trades a little edge aliasing for numerical stability;
    reference grid.py:216-222,374-378)."""
    return 1.2 * math.pi * math.sqrt(0.25 * width ** 2 - 1.0)


def antialias_kernel(width: float, oversample: int, beta: float | None = None):
    """1D anti-aliasing kernel, shape (oversample, size) complex64.

    First axis is the subpixel position, second the pixel position; see
    module docstring for the indexing convention.
    """
    if beta is None:
        beta = default_beta(width)
    hsize = int(math.ceil(0.5 * width))
    size = 2 * hsize
    kernel = np.empty((oversample, size), np.complex64)
    for s in range(oversample):
        bias = (s + 0.5) / oversample + hsize - 1
        kernel[s, :] = kaiser_bessel(np.arange(size) - bias, width, beta)
    return kernel


def antialias_w_kernel(
    cell_wavelengths: float,
    w: np.ndarray,
    width: int,
    oversample: int,
    antialias_width: float,
    image_oversample: int,
    beta: float,
):
    r"""Combined anti-aliasing + W kernel, shape (len(w), oversample, width).

    Evaluates the closed-form image-space product of the anti-alias taper's
    transform, the separable W phase, and the half-subpixel shift, then DFTs
    to UV space on an ``image_oversample``-finer grid and crops (the
    oversampling suppresses aliasing in the tabulated kernel).

    Parameters mirror reference ``grid.py:235-334``; ``w`` is in wavelengths.
    """
    w = np.asarray(w, np.float64)
    out_pixels = oversample * width
    assert out_pixels % 2 == 0, "odd kernel tabulations not supported"
    pixels = out_pixels * image_oversample
    uv_width = width * cell_wavelengths * image_oversample
    image_step = 1.0 / uv_width
    l = (np.arange(pixels) - (pixels // 2)) * image_step
    shift_by = -0.5 * cell_wavelengths / oversample

    scale_l = l * cell_wavelengths
    aa_factor = cell_wavelengths * kaiser_bessel_fourier(scale_l, antialias_width, beta)
    l2 = l * l
    l4 = l2 * l2
    w_arg = np.outer(-w, -0.5 * l2 - 5.0 / 24.0 * l4)
    phase = 2 * np.pi * (w_arg + shift_by * l)
    image_values = aa_factor * (np.cos(phase) + 1j * np.sin(phase))

    uv_values = np.fft.fft(np.fft.ifftshift(image_values, axes=-1), axis=-1) * image_step
    uv_values = np.concatenate(
        (uv_values[..., -(out_pixels // 2):], uv_values[..., : out_pixels // 2]), axis=-1
    )
    # Sub-kernel index runs backwards relative to the tabulation order
    # because it encodes the visibility's subpixel position, not the tap's.
    kernel = uv_values.reshape(w.shape + (width, oversample))[..., ::-1]
    kernel = np.swapaxes(kernel, -2, -1)
    return np.ascontiguousarray(kernel)


def plane_w_values(image_parameters, grid_parameters) -> np.ndarray:
    """Residual w (in wavelengths) of each W plane relative to its slice's
    mid-w, consistent with the quantiser in :mod:`..preprocess`.

    Global plane ``p = s * w_planes + q`` covers scaled w in ``[p, p+1)``
    where ``scaled = w * w_scale + w_planes / 2`` and
    ``w_scale = (w_slices - 0.5) * w_planes / max_w``; its centre is at
    residual ``(q + 0.5 - w_planes/2) / w_scale`` from the slice mid-w.
    """
    gp = grid_parameters
    w_scale = (gp.w_slices - 0.5) * gp.w_planes / gp.fixed.max_w  # 1/m
    step_wl = 1.0 / (w_scale * image_parameters.wavelength)
    q = np.arange(gp.w_planes)
    return (q + 0.5 - 0.5 * gp.w_planes) * step_wl


def make_convolution_kernel(image_parameters, grid_parameters) -> np.ndarray:
    """Tabulate the full kernel stack for one channel:
    shape (w_planes, oversample, kernel_width), in the image's complex
    dtype (tabulation is internally double precision)."""
    gp = grid_parameters
    ip = image_parameters
    cell_wavelengths = ip.cell_size / ip.wavelength
    beta = default_beta(gp.fixed.antialias_width)
    ws = plane_w_values(ip, gp)
    kern = antialias_w_kernel(
        cell_wavelengths,
        ws,
        gp.fixed.kernel_width,
        gp.fixed.oversample,
        gp.fixed.antialias_width,
        gp.fixed.image_oversample,
        beta,
    )
    return kern.astype(ip.fixed.complex_dtype)


def taper(N: int, antialias_width: float, oversample: int,
          beta: float | None = None) -> np.ndarray:
    """Image-space taper of the anti-aliasing kernel for an N-pixel image,
    including the sinc correction for piecewise-constant (subpixel-sampled)
    kernel application (reference grid.py:404-423)."""
    if beta is None:
        beta = default_beta(antialias_width)
    x = np.arange(N) / N - 0.5
    out = kaiser_bessel_fourier(x, antialias_width, beta)
    out = out * np.sinc(x / oversample)
    return out.astype(np.float64)


def mid_w_values(image_parameters, grid_parameters) -> np.ndarray:
    """Mid-w (in wavelengths) of each W-stacking slice, applied as the
    per-slice phase correction at FFT time (reference frontend.py:509-510)."""
    gp = grid_parameters
    slice_w_step = gp.fixed.max_w / image_parameters.wavelength / (gp.w_slices - 0.5)
    return np.arange(gp.w_slices) * slice_w_step
