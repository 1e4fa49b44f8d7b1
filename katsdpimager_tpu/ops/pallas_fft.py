r"""Fused Pallas four-step FFT: MXU column transforms + fused epilogues.

XLA's TPU FFT custom call runs at memory speed (~27 ms for an 8k
complex64 2-D transform through the tunnel) and the imaging step pays it
once per W slice per major cycle — roughly a third of the 8k per-channel
time (doc/PERFORMANCE.md).  The reference leans on cuFFT plus separate
``layer_to_image`` kernels (`/root/reference/katsdpimager/fft.py`,
`imager_kernels/layer_image.mako`); this is the TPU-first fusion of
both: a Bailey four-step transform as two MXU dots per axis inside one
Pallas kernel, with the imaging corrections (checkerboard shifts, taper
division, n and W-phase factors) fused into the transform's prologue and
epilogue so no separate elementwise pass ever touches HBM.

Structure (per 2-D transform of a (P, N, N) plane):

- **column pass** over 128-wide column blocks: the block (N, 128) lives
  in VMEM; with n = n2*N1 + n1 the transform along the column axis is
  ``W1 @ (T * perm(W2 @ X))`` — two contract-major (MXU-shaped) dots of
  the small DFT matrices, a twiddle multiply, and a static (k2, n1) ->
  (n1, k2) row permutation done in VMEM;
- a plane **transpose** between the two passes (XLA relayout — lanes
  cannot cross into sublanes inside the kernel);
- the second column pass fuses the epilogue: for ``grid_to_image`` the
  W-correction cos/sin, n/taper² division and checkerboard are computed
  in-kernel and the result ACCUMULATES into the (transposed) dirty
  image, so the whole FFT + correction + accumulate chain is two kernel
  launches and one relayout.

The dirty accumulator stays TRANSPOSED across the W-slice loop (all
correction factors are (row, col)-symmetric) and is transposed once per
channel by the caller.

Complex data moves as separate re/im f32 planes (the tunnel cannot
transfer complex64, and Mosaic prefers real tiles); all dots run at
``Precision.HIGHEST`` (3-pass bf16 emulation — bf16-class DFT matrices
would put ~4e-3 errors on unit-modulus twiddles, far above the imaging
gate).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _split(n: int):
    """N1 * N2 = n, both MXU-friendly (<= 128), N1 >= N2 (ops/fft.py)."""
    if n & (n - 1) or n < 4:
        return None
    n1 = 1 << ((n.bit_length() - 1 + 1) // 2)
    n2 = n // n1
    if n1 > 128 or n2 > 128:
        return None
    return n1, n2


def _dft_consts(n: int, sign: int):
    """(W1, W2, twiddle) complex128 -> float32 re/im parts.

    Unnormalised in both directions (grid_to_image wants the
    unnormalised inverse — it multiplies by N² afterwards in the XLA
    formulation, which cancels the 1/N² of a normalised inverse).
    """
    n1, n2 = _split(n)
    a1 = np.arange(n1)
    a2 = np.arange(n2)
    w1 = np.exp(sign * 2j * np.pi / n1 * np.outer(a1, a1))
    w2 = np.exp(sign * 2j * np.pi / n2 * np.outer(a2, a2))
    # y[k1*N2 + k2] = sum_n1 W1[k1, n1] T[n1, k2] sum_n2 x[n2*N1+n1] W2[n2, k2]
    tw = np.exp(sign * 2j * np.pi / n * np.outer(a1, a2))
    return [a.astype(np.float32) for a in
            (w1.real, w1.imag, w2.real, w2.imag, tw.real, tw.imag)]


def _cdot(ar, ai, br, bi):
    """Complex matmul of VMEM tiles (contract ar/ai's LAST dim with
    br/bi's FIRST): Gauss 3-multiplication form."""
    dn = (((1,), (0,)), ((), ()))

    def hdot(x, y):
        return lax.dot_general(x, y, dn,
                               preferred_element_type=jnp.float32,
                               precision=_HI)

    m1 = hdot(ar, br)
    m2 = hdot(ai, bi)
    m3 = hdot(ar + ai, br + bi)
    return m1 - m2, m3 - m1 - m2


def _col_fft_block(xr, xi, consts, n1: int, n2: int, cw: int):
    """Four-step transform along axis 0 of a (N, cw) VMEM block.

    Returns (yr, yi) with output index k = k1*N2 + k2 in order.
    """
    w1r, w1i, w2r, w2i, twr, twi = consts
    n = n1 * n2
    # step 1: contract n2 (major): S[k2, n1*cw] = W2 @ X
    sr, si = _cdot(w2r, w2i, xr.reshape(n2, n1 * cw),
                   xi.reshape(n2, n1 * cw))
    # twiddle T[n1, k2] on (k2, n1, cw)
    sr = sr.reshape(n2, n1, cw)
    si = si.reshape(n2, n1, cw)
    tr = twr.T[:, :, None]     # (k2, n1, 1)
    ti = twi.T[:, :, None]
    zr = sr * tr - si * ti
    zi = sr * ti + si * tr
    # corner turn: (k2, n1, cw) -> (n1, k2, cw) — static row permutation
    # with lanes untouched (sublane shuffle; falls back to interpret jnp)
    zr = jnp.swapaxes(zr, 0, 1).reshape(n1, n2 * cw)
    zi = jnp.swapaxes(zi, 0, 1).reshape(n1, n2 * cw)
    # step 2: contract n1 (major): Y[k1, k2*cw] = W1 @ Z
    yr, yi = _cdot(w1r, w1i, zr, zi)
    return yr.reshape(n, cw), yi.reshape(n, cw)


def _make_col_kernel(n1: int, n2: int, cw: int):
    """Plain column-pass kernel: y = colfft(x) over (N, cw) blocks."""

    def kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi,
               yr_ref, yi_ref):
        consts = [w1r[:], w1i[:], w2r[:], w2i[:], twr[:], twi[:]]
        yr, yi = _col_fft_block(xr_ref[0], xi_ref[0], consts, n1, n2, cw)
        yr_ref[0] = yr
        yi_ref[0] = yi

    return kernel


def col_fft(xr, xi, sign: int, cw: int = 128, interpret: bool | None = None):
    """Unnormalised DFT along axis -2 of (..., N, M) f32 re/im planes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *batch, n, m = xr.shape
    n1, n2 = _split(n)
    assert m % cw == 0, (m, cw)
    grid = (int(np.prod(batch, dtype=np.int64)) if batch else 1, m // cw)
    bshape = xr.reshape(-1, n, m).shape
    consts = [jnp.asarray(c) for c in _dft_consts(n, sign)]

    def im(b, c):
        return (b, 0, c)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        _make_col_kernel(n1, n2, cw),
        grid=grid,
        in_specs=[pl.BlockSpec((1, n, cw), im),
                  pl.BlockSpec((1, n, cw), im)] + [vmem] * 6,
        out_specs=[pl.BlockSpec((1, n, cw), im),
                   pl.BlockSpec((1, n, cw), im)],
        out_shape=[jax.ShapeDtypeStruct(bshape, jnp.float32),
                   jax.ShapeDtypeStruct(bshape, jnp.float32)],
        compiler_params=_compiler_params(n, cw),
        interpret=interpret,
    )(xr.reshape(bshape), xi.reshape(bshape), *consts)
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


def _default_cw(n: int) -> int:
    """Column-block width: keep the per-block working set well inside
    VMEM (stages are (N, cw) f32 re/im pairs).  KTPU_FFT_CW overrides
    for on-chip tuning.

    Mosaic pads the lane (last) dimension to 128, so cw < 128 saves no
    VMEM on the (N, cw) I/O blocks — 128 is the only width that is both
    lane-full and minimal, at every N."""
    env = os.environ.get("KTPU_FFT_CW")
    if env:
        return int(env)
    return 128


def _compiler_params(n: int, cw: int) -> pltpu.CompilerParams:
    """Raise Mosaic's scoped-VMEM cap for the big column blocks.

    The default 16 MiB cap sizes the compiler's stack for one live
    (N, 128) f32 re/im pair plus the four-step intermediates; measured
    on v5e (round 5) the 4k pass needs 16.04 MiB and the 8k fused pass
    ~40 MiB — both well inside the chip's 128 MiB VMEM.  KTPU_FFT_VMEM_MB
    overrides."""
    mb = int(os.environ.get("KTPU_FFT_VMEM_MB", "0"))
    if not mb:
        # I/O blocks (in + out re/im + aliased image) + four-step stage
        # intermediates (two Gauss dots' six products, corner-turn
        # copies) + the epilogue's trig/common factors, all (N, cw) f32
        # planes lane-padded to 128.  The epilogue kernel measured
        # 33.24 MiB live at N=4096 on v5e (round 5), i.e. ~17 planes;
        # size for 18 plus slack.
        planes = 18
        mb = max(16, (n * max(cw, 128) * 4 * planes) // (1 << 20) + 8)
    return pltpu.CompilerParams(vmem_limit_bytes=mb << 20)


def _make_cb_col_kernel(n1: int, n2: int, cw: int):
    """Column pass with the input checkerboard fused: y = colfft(cb * x).

    cb(r, c) = (-1)^(r+c) — the shift-free ifftshift of ops/fourier.py,
    computed from iotas instead of a separate HBM elementwise pass.
    """
    n = n1 * n2

    def kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi,
               yr_ref, yi_ref):
        j = pl.program_id(1)
        rows = lax.broadcasted_iota(jnp.int32, (n, cw), 0)
        cols = j * cw + lax.broadcasted_iota(jnp.int32, (n, cw), 1)
        sign = (1.0 - 2.0 * ((rows + cols) & 1)).astype(jnp.float32)
        consts = [w1r[:], w1i[:], w2r[:], w2i[:], twr[:], twi[:]]
        yr, yi = _col_fft_block(xr_ref[0] * sign, xi_ref[0] * sign,
                                consts, n1, n2, cw)
        yr_ref[0] = yr
        yi_ref[0] = yi

    return kernel


def _make_epi_col_kernel(n1: int, n2: int, cw: int):
    """Column pass fused with the grid->image epilogue.

    Consumes the TRANSPOSED pass-A output; completes the 2-D inverse
    transform for its 128-column block of the transposed layer, then
    applies the imaging corrections in place and ACCUMULATES into the
    transposed dirty image (aliased input/output):

        outT = imgT + Y.re * (cos(ph) * common) - Y.im * (sin(ph) * common)
        common = cb * n_lm / taper2,  ph = 2 pi w (n_lm - 1)

    All correction factors are (row, col)-symmetric, so the transposed
    evaluation uses the same formulas (ops/fourier.py grid_to_image_impl;
    reference image.py:743-800 / layer_image.mako).
    """
    n = n1 * n2

    def kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi,
               k1d_row, k1d_col, scal_ref, img_ref, out_ref):
        j = pl.program_id(1)
        consts = [w1r[:], w1i[:], w2r[:], w2i[:], twr[:], twi[:]]
        yr, yi = _col_fft_block(xr_ref[0], xi_ref[0], consts, n1, n2, cw)

        w = scal_ref[0]
        ps = scal_ref[1]
        rows = lax.broadcasted_iota(jnp.int32, (n, cw), 0)
        cols = j * cw + lax.broadcasted_iota(jnp.int32, (n, cw), 1)
        half = jnp.float32(0.5 * n)
        lm_r = (rows.astype(jnp.float32) - half) * ps
        lm_c = (cols.astype(jnp.float32) - half) * ps
        n_lm = jnp.sqrt(1.0 - lm_r * lm_r - lm_c * lm_c)
        phase = (2.0 * np.pi) * w * (n_lm - 1.0)
        cb = (1.0 - 2.0 * ((rows + cols) & 1)).astype(jnp.float32)
        taper2 = k1d_row[:] * k1d_col[0][None, :]
        common = cb * n_lm / taper2
        out_ref[0] = (img_ref[0]
                      + yr * (jnp.cos(phase) * common)
                      - yi * (jnp.sin(phase) * common))

    return kernel


def grid_to_image_fused(grid, imageT, kernel1d, w, pixel_size, *,
                        pixels: int, interpret: bool | None = None):
    """Fused FFT + W-correction + accumulate (transposed-dirty carry).

    grid: (P, N, N) complex64, centred; imageT: (P, N, N) f32 — the
    TRANSPOSED dirty accumulator; returns the updated imageT.  Callers
    keep the dirty transposed across the W-slice loop (the factors are
    symmetric) and transpose once per channel.
    """
    return grid_to_image_fused_parts(
        jnp.real(grid).astype(jnp.float32),
        jnp.imag(grid).astype(jnp.float32),
        imageT, kernel1d, w, pixel_size, pixels=pixels,
        interpret=interpret)


def grid_to_image_fused_parts(gr, gi, imageT, kernel1d, w, pixel_size, *,
                              pixels: int, interpret: bool | None = None):
    """:func:`grid_to_image_fused` taking the grid as separate (P, N, N)
    f32 re/im planes — the layout the fused gridder combine
    (:func:`.pallas_gridder.combine_planes_fused`) emits, so no complex64
    grid is ever materialized between gridding and FFT."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Pp = gr.shape[0]
    n = pixels
    n1, n2 = _split(n)
    cw = _default_cw(n)
    consts = [jnp.asarray(c) for c in _dft_consts(n, +1)]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def im(b, c):
        return (b, 0, c)

    # pass A: columns of (grid * cb)
    ar, ai = pl.pallas_call(
        _make_cb_col_kernel(n1, n2, cw),
        grid=(Pp, n // cw),
        in_specs=[pl.BlockSpec((1, n, cw), im),
                  pl.BlockSpec((1, n, cw), im)] + [vmem] * 6,
        out_specs=[pl.BlockSpec((1, n, cw), im),
                   pl.BlockSpec((1, n, cw), im)],
        out_shape=[jax.ShapeDtypeStruct(gr.shape, jnp.float32),
                   jax.ShapeDtypeStruct(gr.shape, jnp.float32)],
        compiler_params=_compiler_params(n, cw),
        interpret=interpret,
    )(gr, gi, *consts)
    # relayout between the passes (lanes cannot cross into sublanes
    # inside the kernel); XLA transposes run at memory speed.
    arT = jnp.swapaxes(ar, -1, -2)
    aiT = jnp.swapaxes(ai, -1, -2)

    k1d = jnp.asarray(kernel1d, jnp.float32)
    scal = jnp.stack([jnp.asarray(w, jnp.float32),
                      jnp.asarray(pixel_size, jnp.float32)])
    outT = pl.pallas_call(
        _make_epi_col_kernel(n1, n2, cw),
        grid=(Pp, n // cw),
        in_specs=([pl.BlockSpec((1, n, cw), im),
                   pl.BlockSpec((1, n, cw), im)] + [vmem] * 6
                  + [pl.BlockSpec((n, 1), lambda b, c: (0, 0)),
                     pl.BlockSpec((1, cw), lambda b, c: (0, c)),
                     pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec((1, n, cw), im)]),
        out_specs=pl.BlockSpec((1, n, cw), im),
        out_shape=jax.ShapeDtypeStruct(imageT.shape, jnp.float32),
        input_output_aliases={11: 0},
        compiler_params=_compiler_params(n, cw),
        interpret=interpret,
    )(arT, aiT, *consts, k1d.reshape(n, 1), k1d.reshape(1, n), scal,
      imageT.astype(jnp.float32))
    return outT


def _make_pre_col_kernel(n1: int, n2: int, cw: int):
    """Column pass fused with the image->grid prologue.

    Consumes a block of the TRANSPOSED real model image and builds the
    layer in-register before transforming:

        layer = (img * cb / (taper2 * n_lm)) * exp(-2 pi i w (n_lm - 1))

    (ops/fourier.py image_to_grid_impl; reference image_to_layer.mako).
    Symmetric factors, so the transposed evaluation is unchanged.
    """
    n = n1 * n2

    def kernel(img_ref, w1r, w1i, w2r, w2i, twr, twi,
               k1d_row, k1d_col, scal_ref, yr_ref, yi_ref):
        j = pl.program_id(1)
        w = scal_ref[0]
        ps = scal_ref[1]
        rows = lax.broadcasted_iota(jnp.int32, (n, cw), 0)
        cols = j * cw + lax.broadcasted_iota(jnp.int32, (n, cw), 1)
        half = jnp.float32(0.5 * n)
        lm_r = (rows.astype(jnp.float32) - half) * ps
        lm_c = (cols.astype(jnp.float32) - half) * ps
        n_lm = jnp.sqrt(1.0 - lm_r * lm_r - lm_c * lm_c)
        phase = (-2.0 * np.pi) * w * (n_lm - 1.0)
        cb = (1.0 - 2.0 * ((rows + cols) & 1)).astype(jnp.float32)
        taper2 = k1d_row[:] * k1d_col[0][None, :]
        pre = img_ref[0] * (cb / (taper2 * n_lm))
        consts = [w1r[:], w1i[:], w2r[:], w2i[:], twr[:], twi[:]]
        yr, yi = _col_fft_block(pre * jnp.cos(phase), pre * jnp.sin(phase),
                                consts, n1, n2, cw)
        yr_ref[0] = yr
        yi_ref[0] = yi

    return kernel


def _make_cbout_col_kernel(n1: int, n2: int, cw: int):
    """Column pass with the OUTPUT checkerboard fused: y = cb * colfft(x)
    (the shift-free fftshift on the grid side)."""
    n = n1 * n2

    def kernel(xr_ref, xi_ref, w1r, w1i, w2r, w2i, twr, twi,
               yr_ref, yi_ref):
        j = pl.program_id(1)
        consts = [w1r[:], w1i[:], w2r[:], w2i[:], twr[:], twi[:]]
        yr, yi = _col_fft_block(xr_ref[0], xi_ref[0], consts, n1, n2, cw)
        rows = lax.broadcasted_iota(jnp.int32, (n, cw), 0)
        cols = j * cw + lax.broadcasted_iota(jnp.int32, (n, cw), 1)
        sign = (1.0 - 2.0 * ((rows + cols) & 1)).astype(jnp.float32)
        yr_ref[0] = yr * sign
        yi_ref[0] = yi * sign

    return kernel


def image_to_grid_fused(imageT, kernel1d, w, pixel_size, *, pixels: int,
                        interpret: bool | None = None):
    """Fused prologue + forward FFT for degridding prediction.

    imageT: (P, N, N) f32 — the TRANSPOSED model image (transpose once
    per channel; every W slice reuses it).  Returns the UNTRANSPOSED
    (P, N, N) complex64 grid, centre at the middle:
    ``colfft(swap(colfft(layerT))) == fft2(layer)``.
    """
    gr, gi = image_to_grid_fused_parts(imageT, kernel1d, w, pixel_size,
                                       pixels=pixels, interpret=interpret)
    return lax.complex(gr, gi)


def image_to_grid_fused_parts(imageT, kernel1d, w, pixel_size, *,
                              pixels: int, interpret: bool | None = None):
    """:func:`image_to_grid_fused` returning separate (P, N, N) f32
    re/im planes — the layout the fused degrid window DMA consumes, so
    no complex64 grid is materialized between FFT and degridding."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Pp = imageT.shape[0]
    n = pixels
    n1, n2 = _split(n)
    cw = _default_cw(n)
    consts = [jnp.asarray(c) for c in _dft_consts(n, -1)]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def im(b, c):
        return (b, 0, c)

    k1d = jnp.asarray(kernel1d, jnp.float32)
    scal = jnp.stack([jnp.asarray(w, jnp.float32),
                      jnp.asarray(pixel_size, jnp.float32)])
    shape = (Pp, n, n)
    ar, ai = pl.pallas_call(
        _make_pre_col_kernel(n1, n2, cw),
        grid=(Pp, n // cw),
        in_specs=([pl.BlockSpec((1, n, cw), im)] + [vmem] * 6
                  + [pl.BlockSpec((n, 1), lambda b, c: (0, 0)),
                     pl.BlockSpec((1, cw), lambda b, c: (0, c)),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=[pl.BlockSpec((1, n, cw), im),
                   pl.BlockSpec((1, n, cw), im)],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.float32)],
        compiler_params=_compiler_params(n, cw),
        interpret=interpret,
    )(imageT.astype(jnp.float32), *consts, k1d.reshape(n, 1),
      k1d.reshape(1, n), scal)
    arT = jnp.swapaxes(ar, -1, -2)
    aiT = jnp.swapaxes(ai, -1, -2)
    gr, gi = pl.pallas_call(
        _make_cbout_col_kernel(n1, n2, cw),
        grid=(Pp, n // cw),
        in_specs=[pl.BlockSpec((1, n, cw), im),
                  pl.BlockSpec((1, n, cw), im)] + [vmem] * 6,
        out_specs=[pl.BlockSpec((1, n, cw), im),
                   pl.BlockSpec((1, n, cw), im)],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32),
                   jax.ShapeDtypeStruct(shape, jnp.float32)],
        compiler_params=_compiler_params(n, cw),
        interpret=interpret,
    )(arT, aiT, *consts)
    return gr, gi


def fft2_pallas(x, sign: int = -1, interpret: bool | None = None):
    """2-D unnormalised DFT over the last two axes of a complex array.

    Correctness building block (and benchmark target): two column passes
    with an XLA relayout between; returns in natural order.
    """
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    # columns
    yr, yi = col_fft(xr, xi, sign, interpret=interpret)
    # rows = columns of the transpose
    yr = jnp.swapaxes(yr, -1, -2)
    yi = jnp.swapaxes(yi, -1, -2)
    zr, zi = col_fft(yr, yi, sign, interpret=interpret)
    return lax.complex(jnp.swapaxes(zr, -1, -2), jnp.swapaxes(zi, -1, -2))
