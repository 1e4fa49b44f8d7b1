r"""Pallas TPU kernel for chunked grid accumulation.

The MXU gridder (:mod:`.mxu_gridder`) evaluates, per Morton chunk, a
rank-``Mc`` matrix product ``V @ U`` and adds it into a
``(Rv+K) x (Ru+K)`` window of the UV grid.  The XLA formulation does this
with a ``lax.scan`` whose per-step window read-modify-write round-trips
through HBM between iterations.  This module moves the band product and the
window accumulation into one Pallas kernel:

- the factor matrices (assembled gather-only in XLA, split into real and
  imaginary planes) stream through VMEM via ``BlockSpec`` — Pallas
  double-buffers the next chunk's factors during the current matmul;
- the complex band product runs as four real MXU matmuls in-kernel;
- the grid stays in HBM (``pl.ANY``); each chunk's window is DMA'd into
  VMEM scratch, accumulated, and DMA'd back.  TPU grid iterations execute
  sequentially, so overlapping windows of consecutive chunks are safe.

The kernel is numerically identical to ``mxu_gridder.grid_chunks_impl``
(same factor matrices, same matmul), differing only in scheduling.
``interpret=True`` is used automatically on non-TPU backends so the same
code path is testable on CPU.

STATUS (round 3): redesigned for Mosaic's DMA alignment rules.  Round 2
found the windowed VMEM DMA rejected for unaligned dynamic indices
("tile index ... divisible by the tiling"); the round-3 formulation
aligns every transfer without touching the chunk plan:

- window ROW offsets are tile anchors (multiples of ts >= 32), already
  sublane-aligned; window heights round up to a multiple of 8;
- window COLUMN offsets round DOWN to a multiple of 128 and the factor
  assembly absorbs the shift: ``_chunk_factors`` builds taps relative to
  the ALIGNED anchor, so the misalignment d = au - au128 (a multiple of
  ts < 128) just moves the taps d columns into a lane-aligned,
  128-multiple-width window.  Out-of-footprint columns hold zero taps,
  so the wider band adds exact zeros.

The kernel is numerically identical to the unaligned formulation
(asserted vs the XLA path in interpret mode); on hardware it awaits a
tunnel window for the compile + A/B against ``assembly="tapdict"``
(86 GGAPS).  The flop overhead of alignment at ts=64/K=60 is
128x256 / 124x124 = 2.1x the band MACs — the bet is that VMEM-resident
window accumulation and double-buffered factor streaming beat the XLA
scan's HBM round-trips by more.  Stays opt-in (``KTPU_USE_PALLAS=1``);
the whole-plan factor materialization (NC x Mc x ruk x 2 planes) also
caps it to benchmark scope until a per-group variant lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _aligned_geom(rv: int, ru: int, K: int) -> tuple:
    """(rvk, ruk): window height (multiple of 8) and width (multiple of
    128, covering the worst column misalignment d_max = 128 - ru for
    tiles narrower than a lane row)."""
    rvk = -(-(rv + K) // 8) * 8
    d_max = max(0, 128 - ru)
    ruk = -(-(ru + d_max + K) // 128) * 128
    return rvk, ruk


def _align_anchors(anchor):
    """Round column anchors down to the 128-lane boundary (rows are
    already multiples of the tile size >= 32, i.e. sublane-aligned)."""
    return jnp.stack([anchor[:, 0], (anchor[:, 1] // 128) * 128], axis=1)


def _band_kernel(anchors_ref, vr_ref, vi_ref, ur_ref, ui_ref,
                 gre_in, gim_in, gre_out, gim_out, scratch_re, scratch_im,
                 sem_re, sem_im):
    """One grid step: band = V @ U (complex), window += band."""
    c = pl.program_id(0)
    av = anchors_ref[c, 0]
    au = anchors_ref[c, 1]

    vr = vr_ref[0]
    vi = vi_ref[0]
    ur = ur_ref[0]
    ui = ui_ref[0]
    band_re = (jnp.dot(vr, ur, preferred_element_type=jnp.float32)
               - jnp.dot(vi, ui, preferred_element_type=jnp.float32))
    band_im = (jnp.dot(vr, ui, preferred_element_type=jnp.float32)
               + jnp.dot(vi, ur, preferred_element_type=jnp.float32))

    h, w = scratch_re.shape
    read_re = pltpu.make_async_copy(
        gre_out.at[pl.ds(av, h), pl.ds(au, w)], scratch_re, sem_re)
    read_im = pltpu.make_async_copy(
        gim_out.at[pl.ds(av, h), pl.ds(au, w)], scratch_im, sem_im)
    read_re.start()
    read_im.start()
    read_re.wait()
    read_im.wait()
    scratch_re[:] = scratch_re[:] + band_re
    scratch_im[:] = scratch_im[:] + band_im
    write_re = pltpu.make_async_copy(
        scratch_re, gre_out.at[pl.ds(av, h), pl.ds(au, w)], sem_re)
    write_im = pltpu.make_async_copy(
        scratch_im, gim_out.at[pl.ds(av, h), pl.ds(au, w)], sem_im)
    write_re.start()
    write_im.start()
    write_re.wait()
    write_im.wait()


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def band_accumulate(gre, gim, vr, vi, ur, ui, anchors, *,
                    interpret: bool = False):
    """Accumulate all chunk bands into the (padded) grid planes.

    gre/gim: (Npv, Npu) float32 (donated).  vr/vi: (NC, RvK, Mc);
    ur/ui: (NC, Mc, RuK); anchors: (NC, 2) int32 window origins.
    """
    nc, rvk, mc = vr.shape
    ruk = ur.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, rvk, mc), lambda c, a: (c, 0, 0)),
            pl.BlockSpec((1, rvk, mc), lambda c, a: (c, 0, 0)),
            pl.BlockSpec((1, mc, ruk), lambda c, a: (c, 0, 0)),
            pl.BlockSpec((1, mc, ruk), lambda c, a: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((rvk, ruk), jnp.float32),
            pltpu.VMEM((rvk, ruk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _band_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(gre.shape, jnp.float32),
            jax.ShapeDtypeStruct(gim.shape, jnp.float32),
        ],
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(anchors, vr, vi, ur, ui, gre, gim)


def _degrid_kernel(anchors_ref, vtr_ref, vti_ref, utr_ref, uti_ref,
                   gre_ref, gim_ref, pre_ref, pim_ref,
                   win_re, win_im, sem_re, sem_im):
    """One grid step of degridding: window gather -> T = Vt @ win (MXU) ->
    per-vis tap contraction (VPU)."""
    c = pl.program_id(0)
    av = anchors_ref[c, 0]
    au = anchors_ref[c, 1]
    h, w = win_re.shape
    read_re = pltpu.make_async_copy(
        gre_ref.at[pl.ds(av, h), pl.ds(au, w)], win_re, sem_re)
    read_im = pltpu.make_async_copy(
        gim_ref.at[pl.ds(av, h), pl.ds(au, w)], win_im, sem_im)
    read_re.start()
    read_im.start()
    read_re.wait()
    read_im.wait()

    vtr = vtr_ref[0]
    vti = vti_ref[0]
    wr = win_re[:]
    wi = win_im[:]
    t_re = (jnp.dot(vtr, wr, preferred_element_type=jnp.float32)
            - jnp.dot(vti, wi, preferred_element_type=jnp.float32))
    t_im = (jnp.dot(vtr, wi, preferred_element_type=jnp.float32)
            + jnp.dot(vti, wr, preferred_element_type=jnp.float32))
    utr = utr_ref[0]
    uti = uti_ref[0]
    pre_ref[0] = jnp.sum(t_re * utr - t_im * uti, axis=-1)
    pim_ref[0] = jnp.sum(t_re * uti + t_im * utr, axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def degrid_predict(gre, gim, vtr, vti, utr, uti, anchors, *,
                   interpret: bool = False):
    """Predict per-chunk visibilities from the padded grid planes.

    gre/gim: (Npv, Npu) float32; vtr/vti: (NC, Mc, RvK) (UNconjugated
    kernel factors); utr/uti: (NC, Mc, RuK).  Returns (pred_re, pred_im)
    of shape (NC, Mc).
    """
    nc, mc, rvk = vtr.shape
    ruk = utr.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, mc, rvk), lambda c, a: (c, 0, 0)),
            pl.BlockSpec((1, mc, rvk), lambda c, a: (c, 0, 0)),
            pl.BlockSpec((1, mc, ruk), lambda c, a: (c, 0, 0)),
            pl.BlockSpec((1, mc, ruk), lambda c, a: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, mc), lambda c, a: (c, 0)),
            pl.BlockSpec((1, mc), lambda c, a: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rvk, ruk), jnp.float32),
            pltpu.VMEM((rvk, ruk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _degrid_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nc, mc), jnp.float32),
            jax.ShapeDtypeStruct((nc, mc), jnp.float32),
        ],
        interpret=interpret,
    )(anchors, vtr, vti, utr, uti, gre, gim)


def degrid_chunks_pallas(grid, kernel, plan_uv, plan_sub, plan_wp, plan_wt,
                         plan_vis, plan_anchor, plan_valid, *, pixels: int,
                         rv: int, ru: int, interpret: bool | None = None):
    """Drop-in single-pol replacement for ``mxu_gridder.degrid_chunks``.

    ``grid`` is the PADDED (1, pixels+rv, pixels+ru) complex model grid;
    returns updated (NC, Mc, 1) visibilities.
    """
    from .mxu_gridder import _chunk_factors

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    assert plan_vis.shape[-1] == 1, "Pallas path currently supports 1 pol"
    K = kernel.shape[-1]
    rvk, ruk = _aligned_geom(rv, ru, K)
    aligned = _align_anchors(plan_anchor)

    def factors(uv_c, sub_c, wp_c, anc_c, val_c):
        Vt, Utap = _chunk_factors(kernel, uv_c, sub_c, wp_c, anc_c, val_c,
                                  pixels=pixels, rv=rvk - K, ru=ruk - K)
        return Vt.real, Vt.imag, Utap.real, Utap.imag

    vtr, vti, utr, uti = jax.vmap(factors)(
        plan_uv, plan_sub, plan_wp, aligned, plan_valid)
    H, W = _plane_shape(grid.shape[1], grid.shape[2], rvk, ruk)
    gre = jnp.zeros((H, W), jnp.float32).at[
        :grid.shape[1], :grid.shape[2]].set(grid[0].real.astype(jnp.float32))
    gim = jnp.zeros((H, W), jnp.float32).at[
        :grid.shape[1], :grid.shape[2]].set(grid[0].imag.astype(jnp.float32))
    pre, pim = degrid_predict(
        gre, gim, vtr, vti, utr, uti, aligned, interpret=interpret)
    return jax.jit(
        lambda v, w, a, b: v - w * jax.lax.complex(a, b)[..., None
                                                         ].astype(v.dtype)
    )(plan_vis, plan_wt, pre, pim)


def _assemble_factors(kernel, weights_grid, uv, sub_uv, w_plane, vis,
                      anchor, valid, *, pixels: int, rv: int, ru: int):
    """XLA gather-only factor assembly for a block of chunks (vmapped
    version of mxu_gridder._chunk_factors, split into re/im planes)."""
    from .mxu_gridder import _chunk_factors

    def one(uv_c, sub_c, wp_c, vis_c, anc_c, val_c):
        Vt, Utap = _chunk_factors(kernel, uv_c, sub_c, wp_c, anc_c, val_c,
                                  pixels=pixels, rv=rv, ru=ru)
        half = pixels // 2
        uq = uv_c[:, 0] + half
        vq = uv_c[:, 1] + half
        dw = weights_grid[0, vq, uq]
        sample = vis_c[:, 0] * dw
        V = jnp.conj(Vt).T                          # (RvK, Mc)
        U = sample[:, None] * jnp.conj(Utap)        # (Mc, RuK)
        return V.real, V.imag, U.real, U.imag

    return jax.vmap(one)(uv, sub_uv, w_plane, vis, anchor, valid)


def _plane_shape(rows: int, cols: int, rvk: int, ruk: int) -> tuple:
    """HBM plane extent: covers every aligned window and keeps the array
    itself (8, 128)-tile-shaped."""
    return (-(-(rows + rvk) // 8) * 8, -(-(cols + ruk) // 128) * 128)


def grid_chunks_pallas(grid, kernel, weights_grid, plan_uv, plan_sub,
                       plan_wp, plan_vis, plan_anchor, plan_valid, *,
                       pixels: int, rv: int, ru: int,
                       interpret: bool | None = None):
    """Drop-in single-pol replacement for ``mxu_gridder.grid_chunks``:
    factors assembled in XLA, band accumulation in the Pallas kernel.

    ``grid`` is the PADDED (1, pixels+rv, pixels+ru) complex grid.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    assert grid.shape[0] == 1, "Pallas path currently supports 1 polarization"
    K = kernel.shape[-1]
    rvk, ruk = _aligned_geom(rv, ru, K)
    aligned = _align_anchors(plan_anchor)
    vr, vi, ur, ui = _assemble_factors(
        kernel, weights_grid, plan_uv, plan_sub, plan_wp, plan_vis,
        aligned, plan_valid, pixels=pixels, rv=rvk - K, ru=ruk - K)
    H, W = _plane_shape(grid.shape[1], grid.shape[2], rvk, ruk)
    gre = jnp.zeros((H, W), jnp.float32).at[
        :grid.shape[1], :grid.shape[2]].set(grid[0].real.astype(jnp.float32))
    gim = jnp.zeros((H, W), jnp.float32).at[
        :grid.shape[1], :grid.shape[2]].set(grid[0].imag.astype(jnp.float32))
    gre, gim = band_accumulate(gre, gim, vr, vi, ur, ui, aligned,
                               interpret=interpret)
    combined = jax.jit(
        lambda a, b: jax.lax.complex(a, b)[None].astype(grid.dtype)
    )(gre[:grid.shape[1], :grid.shape[2]],
      gim[:grid.shape[1], :grid.shape[2]])
    return combined
