r"""Direct prediction: DFT of point-source components, subtracted in place.

The reference implements this as a CUDA kernel looping sources in shared
memory per visibility (``predict.mako``, ``predict.py``).  On TPU the
computation is a natural MXU workload: the phase matrix is a (N_vis x 3) @
(3 x N_src) matmul, and the flux accumulation another matmul, evaluated in
source blocks so nothing large is materialised.

Conventions (parity with reference ``predict.py:122-150,419-439``):

- quantized UV is dequantized at bin centres:
  ``uv_wl = (uv * oversample + sub_uv + 0.5) * cell / (oversample * lambda)``;
- w is dequantized per plane and offset by the W-slice mid-w;
- the predicted visibility is ``sum_s flux[s] * exp(-2 pi i (u l + v m +
  w (n-1)))`` and ``weights * predicted`` is subtracted from the stored
  (pre-weighted) visibilities;
- fluxes are tapered by ``sinc(l / (image_size * oversample))`` per axis to
  mirror the quantisation of the UV coordinates (predict.py:53-64).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def uvw_scale_bias(image_parameters, grid_parameters):
    """(uv_scale, w_scale, w_bias) in wavelengths for dequantization."""
    ip, gp = image_parameters, grid_parameters
    uv_scale = ip.cell_size / gp.fixed.oversample / ip.wavelength
    w_scale = gp.fixed.max_w / ((gp.w_slices - 0.5) * gp.w_planes) / ip.wavelength
    w_bias = (0.5 - 0.5 * gp.w_planes) * w_scale
    return float(uv_scale), float(w_scale), float(w_bias)


def extract_sky_image(image_parameters, grid_parameters, model_image: np.ndarray):
    """Convert non-zero model-image pixels into (lmn, flux) component lists
    (reference predict.py:73-119, without the dict indirection).

    Returns (lmn (S, 3) float32 with n-1 in the last column, flux (S, P)).
    """
    ip = image_parameters
    mask = np.any(model_image != 0, axis=0)
    ys, xs = np.nonzero(mask)
    pixel_size = float(ip.pixel_size)
    l = (xs - 0.5 * ip.pixels) * pixel_size
    m = (ys - 0.5 * ip.pixels) * pixel_size
    n1 = np.sqrt(1.0 - (np.square(l) + np.square(m))) - 1.0
    lmn = np.stack([l, m, n1], axis=-1).astype(np.float32)
    flux = model_image[:, ys, xs].T.astype(np.float64)
    taper_scale = float(ip.image_size * grid_parameters.fixed.oversample)
    taper = np.sinc(l / taper_scale) * np.sinc(m / taper_scale)
    flux = (flux * taper[:, None]).astype(model_image.dtype)
    return lmn, flux


@partial(jax.jit, static_argnames=("oversample", "block"), donate_argnums=(5,))
def predict_subtract(lmn, flux, uv, sub_uv, w_plane, vis, weights,
                     uv_scale, w_scale, w_bias, *, oversample: int,
                     block: int = 8192):
    """Subtract the DFT of (lmn, flux) from the stored visibilities.

    lmn: (S, 3) float32 (l, m, n-1); flux: (S, P) real;
    vis: (N, P) complex64 (donated); weights: (N, P) float32.
    ``w_bias`` must already include the W-slice mid-w.  N must be a
    multiple of ``block`` or smaller than it (pad with zero weights);
    blocking keeps the (block, S) phase matrix VMEM-friendly.
    """
    u = (uv[:, 0].astype(jnp.float32) * oversample
         + sub_uv[:, 0].astype(jnp.float32) + 0.5) * uv_scale
    v = (uv[:, 1].astype(jnp.float32) * oversample
         + sub_uv[:, 1].astype(jnp.float32) + 0.5) * uv_scale
    w = w_plane.astype(jnp.float32) * w_scale + w_bias
    uvw = jnp.stack([u, v, w], axis=-1)  # (N, 3)
    fluxf = flux.astype(jnp.float32)

    def block_predict(uvw_b):
        # MXU path: phase (B, S) then two real matmuls against the flux.
        # Highest precision: reduced-precision phases shift sources.
        hp = jax.lax.Precision.HIGHEST
        phase = (-2 * jnp.pi) * jnp.matmul(uvw_b, lmn.T, precision=hp)
        re = jnp.matmul(jnp.cos(phase), fluxf, precision=hp)
        im = jnp.matmul(jnp.sin(phase), fluxf, precision=hp)
        return re + 1j * im

    N = vis.shape[0]
    if N <= block:
        predicted = block_predict(uvw)
    else:
        nb = -(-N // block)
        pad = nb * block - N
        uvw_p = jnp.pad(uvw, ((0, pad), (0, 0))).reshape(nb, block, 3)
        predicted = jax.lax.map(block_predict, uvw_p)
        predicted = predicted.reshape(nb * block, -1)[:N]
    return vis - weights * predicted.astype(vis.dtype)


def predict_subtract_reference(lmn, flux, uv, sub_uv, w_plane, vis, weights,
                               uv_scale, w_scale, w_bias, oversample):
    """Numpy oracle (mirrors reference predict.py:419-439)."""
    out = vis.copy()
    for i in range(len(uv)):
        u = (uv[i, 0] * oversample + sub_uv[i, 0] + 0.5) * uv_scale
        v = (uv[i, 1] * oversample + sub_uv[i, 1] + 0.5) * uv_scale
        w = w_plane[i] * w_scale + w_bias
        phase = lmn[:, 0] * u + lmn[:, 1] * v + lmn[:, 2] * w
        rot = np.exp(-2j * np.pi * phase)
        out[i] -= weights[i] * (rot @ flux)
    return out
