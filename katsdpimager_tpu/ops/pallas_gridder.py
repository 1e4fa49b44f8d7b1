r"""Fused Pallas TPU gridder: VMEM factor assembly + MXU band + placed adds.

The XLA ``tapdict`` gridder (:func:`.mxu_gridder.grid_chunks_dense_impl`)
is bound by the HBM row gathers that build its factor matrices: the
round-4 stage decomposition measured the two taps-table gathers at
29-34 ms of the 39 ms per 1M visibilities (4k / K=60 / v5e,
``benchmarks/tapdict_tpu.py``), with the band matmuls at ~4 ms.  The
shifted-tap dictionary is ``(w_planes * oversample * ts, ts+K)`` complex —
16 MB at the production point — so the gathers stream rows from HBM at
random-access bandwidth.

This kernel removes the table entirely.  Only the *unshifted* kernel rows
``(w_planes * oversample, K)`` (~128 KB) live in VMEM, and each chunk's
factor matrices are assembled on-chip:

- **row selection** as a one-hot MXU matmul against the VMEM table
  (the one-hot operand is exact, the table side runs at
  ``Precision.HIGHEST``);
- **per-row lane shift** by the in-window offset as ``log2(ts)``
  binary stages of ``pltpu.roll`` + select — in-register VPU work,
  nothing materialised (the same formulation loses in XLA because each
  stage becomes an HBM pass: 55 vs 28 ms measured);
- **band product** ``conj(V)^T diag(s) conj(U)`` as four HIGHEST
  ``dot_general`` contractions per polarization (grid parity:
  reference ``grid.mako:63-196`` accumulates the identical
  visibility x kernel-tap outer products by atomic scatter);
- **accumulation** into the same 4-colour tile planes the XLA path
  uses, placed by a scalar-prefetched slot index per chunk: the
  (colour, tile) pair is unique per anchor and the Morton-sorted plan
  visits each anchor as one consecutive run, so the output block is
  fetched (via ``input_output_aliases``) when the slot changes,
  accumulated in VMEM while it stays, and flushed when it moves on.

Padding chunks (the occupied-first layouts pad to capacity) route to a
sacrificial trash slot and only copy their block through, so partial
fills cost DMA, not compute.

Numerics: bit-comparable to the XLA tapdict path at f32
(``tests/test_pallas_gridder.py`` asserts agreement against the dense
XLA gridder and the scatter oracle); Mosaic's default matmul precision
is bf16-class (measured 5e-3), hence HIGHEST everywhere.

On non-TPU backends the kernel runs in interpret mode (tests); the
dispatch in :func:`.mxu_gridder.grid_chunks_dense_impl` selects it via
``assembly="pallas"``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


def _stack_tab(kr, K: int, ts2: int):
    """Stack kernel rows (W*O, K) as exact 3-way bf16 splits along lanes:
    [re_hi re_mid re_lo im_hi im_mid im_lo], each zero-padded to ts2.

    lax.reduce_precision, NOT .astype(bf16).astype(f32): XLA's TPU
    simplifier folds the bf16 round-trip away (measured — the folded
    split leaves mid == lo == 0 and bf16-level grid error;
    scripts/mosaic_num_probe2.py).  reduce_precision is the rounding the
    compiler must preserve."""

    def split3(x):
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, ts2 - K)))
        hi = lax.reduce_precision(x, 8, 7)
        r1 = x - hi
        mid = lax.reduce_precision(r1, 8, 7)
        lo = lax.reduce_precision(r1 - mid, 8, 7)
        return [hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
                lo.astype(jnp.bfloat16)]

    return jnp.concatenate(split3(jnp.real(kr)) + split3(jnp.imag(kr)),
                           axis=1)                      # (W*O, 6*ts2)


def _select_shift(tab_ref, idx, sh, mc: int, wo: int, ts2: int,
                  stage: str = "full"):
    """Kernel row ``idx`` shifted ``sh`` lanes right, from a stacked
    bf16-split table: one-hot MXU selection as ONE wide dot (exact — a
    one-hot row has a single 1.0 and hi+mid+lo == f32), then one native
    lane gather for the shift (the roll/select ladder costs ~6x more,
    measured).  The gather requires ts2 <= 128: Mosaic's dynamic lane
    gather reads from a single source vreg (measured round 5)."""
    if stage == "nosel":
        fr = tab_ref[:mc, :ts2].astype(jnp.float32)
        fi = tab_ref[:mc, 3 * ts2:4 * ts2].astype(jnp.float32)
    else:
        onehot = (idx[:, None] == lax.broadcasted_iota(
            jnp.int32, (mc, wo), 1)).astype(jnp.bfloat16)
        sel = jnp.dot(onehot, tab_ref[:],
                      preferred_element_type=jnp.float32)
        fr = (sel[:, :ts2] + sel[:, ts2:2 * ts2]
              + sel[:, 2 * ts2:3 * ts2])
        fi = (sel[:, 3 * ts2:4 * ts2] + sel[:, 4 * ts2:5 * ts2]
              + sel[:, 5 * ts2:])
    cols = lax.broadcasted_iota(jnp.int32, (mc, ts2), 1)
    src = jnp.clip(cols - sh[:, None], 0, ts2 - 1)
    keep = cols >= sh[:, None]
    zero = jnp.zeros((), jnp.float32)
    if stage == "noshift":
        fr = jnp.where(keep, fr, zero)
        fi = jnp.where(keep, fi, zero)
    else:
        fr = jnp.where(keep, jnp.take_along_axis(fr, src, axis=1), zero)
        fi = jnp.where(keep, jnp.take_along_axis(fi, src, axis=1), zero)
    return fr, fi


def _make_kernel(num_pols: int, wo: int, ts2: int, mc: int, gc: int,
                 nc: int, nt2: int, ng: int, stage: str = "full",
                 band: str = "gauss"):
    """Build the fused kernel body for static (P, W*O, 2*ts, Mc, G, NC).

    One grid step processes ``gc`` chunks.  The running anchor's band sum
    lives in VMEM scratch; at a slot-run boundary the scratch is DMA'd
    (write-only — the plan visits each anchor as one consecutive run, so
    every accumulator block is written exactly once) straight into the
    IMAGE-LAYOUT colour planes ``(2, 2, P, nt2, TS2, nt2, TS2)`` at the
    (colour, tile) position decoded from the scalar-prefetched slot
    index: the XLA side then only reshapes (free) and does the four
    shifted adds — no transpose pass.

    The flush is double-buffered: two scratch accumulators alternate per
    anchor run, the DMA for run r is waited only when run r+2 needs the
    buffer back (an SMEM parity/pending state machine), so flushes
    overlap the next run's band compute instead of stalling it.

    ``stage`` (KTPU_PALLAS_STAGE, benchmarking only): "noop" skips chunk
    compute, "nosel" skips the one-hot selection, "noshift" skips the
    lane gather, "noband" replaces the band dots with a cheap fill.
    """

    def kernel(slot_ref, n_ref, iu_ref, iv_ref, su_ref, sv_ref,
               sre_ref, sim_ref, tab_ref, accr_ref, acci_ref,
               scr_re, scr_im, state, sem_re, sem_im):
        i = pl.program_id(0)
        n = n_ref[0]

        @pl.when(i == 0)
        def _():
            state[0] = 1   # first flip lands on buffer 0
            state[1] = 0   # pending DMA on buffer 0
            state[2] = 0   # pending DMA on buffer 1

        def factor(idx, sh):
            return _select_shift(tab_ref, idx, sh, mc, wo, ts2, stage)

        def _acc_dst(ref, s):
            """Image-layout destination block for accumulator slot s.

            The planes are stored as flat (2, 2, P, ext2, ext2) images —
            the exact layout the XLA-side combine consumes — so no
            reshape/copy ever materializes downstream (a 7-d tiled
            layout measured ~67 ms/step of XLA relayout in the round-4
            device profile)."""
            colour = s // (nt2 * nt2)
            rem = s - colour * (nt2 * nt2)
            tv2 = rem // nt2
            tu2 = rem - tv2 * nt2
            a = colour // 2
            b = colour - a * 2
            return ref.at[a, b, :, pl.ds(tv2 * ts2, ts2),
                          pl.ds(tu2 * ts2, ts2)]

        def _flush(cg):
            nxt = slot_ref[jnp.minimum(cg + 1, nc - 1)]
            boundary = jnp.logical_or(cg == n - 1, nxt != slot_ref[cg])

            @pl.when(boundary)
            def _():
                q = state[0]
                s = slot_ref[cg]
                pltpu.make_async_copy(scr_re.at[q], _acc_dst(accr_ref, s),
                                      sem_re.at[q]).start()
                pltpu.make_async_copy(scr_im.at[q], _acc_dst(acci_ref, s),
                                      sem_im.at[q]).start()
                state[1 + q] = 1

        def _begin_run(cg, first):
            """On a run start: flip the buffer parity and reclaim the new
            buffer (wait its 2-runs-ago flush) before any write."""

            @pl.when(first)
            def _():
                q = 1 - state[0]
                state[0] = q

                @pl.when(state[1 + q] == 1)
                def _(q=q):
                    s = slot_ref[cg]
                    pltpu.make_async_copy(
                        scr_re.at[q], _acc_dst(accr_ref, s),
                        sem_re.at[q]).wait()
                    pltpu.make_async_copy(
                        scr_im.at[q], _acc_dst(acci_ref, s),
                        sem_im.at[q]).wait()
                    state[1 + q] = 0

        for g in range(gc):
            cg = i * gc + g

            @pl.when(cg < n)
            def _(g=g, cg=cg):
                first = jnp.logical_or(
                    cg == 0,
                    slot_ref[cg] != slot_ref[jnp.maximum(cg - 1, 0)])
                _begin_run(cg, first)
                q = state[0]
                if stage == "noop":
                    for p in range(num_pols):
                        @pl.when(first)
                        def _(p=p, q=q):
                            scr_re[q, p] = jnp.zeros((ts2, ts2),
                                                     jnp.float32)
                            scr_im[q, p] = jnp.zeros((ts2, ts2),
                                                     jnp.float32)
                    _flush(cg)
                    return
                ar, ai = factor(iv_ref[0, g], sv_ref[0, g])   # conj(Vt)
                br, bi = factor(iu_ref[0, g], su_ref[0, g])   # conj(Utap)
                dn = (((0,), (0,)), ((), ()))

                def hdot(x, y):
                    return lax.dot_general(
                        x, y, dn, preferred_element_type=jnp.float32,
                        precision=_HI)

                if band == "kstack":
                    # Contraction-stacked variant: [ar; ai] against the
                    # sample-scaled U stacked per output part — TWO dots
                    # of double (2*Mc) contraction depth instead of three
                    # Gauss dots of Mc.  4/3 the MXU flops but each dot
                    # pipelines 2x the accumulation steps into one output
                    # tile — an A/B for the measured ~27% MXU efficiency
                    # of the (2ts, Mc)x(Mc, 2ts) Gauss shape.
                    fa = jnp.concatenate([ar, ai], axis=0)    # (2Mc, ts2)
                else:
                    bab = br + bi                             # (Mc, ts2)

                polstack = (num_pols > 1 and stage == "full"
                            and os.environ.get("KTPU_PALLAS_POLSTACK",
                                               "1") == "1")
                if band == "kstack" and polstack:
                    # kstack x polstack: sample-scaled U factors stack
                    # along the output lane axis per pol AND along the
                    # contraction axis per complex part — TWO dots per
                    # chunk for any P, each (2Mc)-deep and P*ts2 wide.
                    trs, tis = [], []
                    for p in range(num_pols):
                        sr = sre_ref[0, g, p][:, None]
                        si = sim_ref[0, g, p][:, None]
                        trs.append(br * sr - bi * si)
                        tis.append(br * si + bi * sr)
                    tr_all = jnp.concatenate(trs, axis=1)   # (Mc, P*ts2)
                    ti_all = jnp.concatenate(tis, axis=1)
                    bre_all = hdot(fa, jnp.concatenate(
                        [tr_all, -ti_all], axis=0))         # (ts2, P*ts2)
                    bim_all = hdot(fa, jnp.concatenate(
                        [ti_all, tr_all], axis=0))
                    for p in range(num_pols):
                        band_re = bre_all[:, p * ts2:(p + 1) * ts2]
                        band_im = bim_all[:, p * ts2:(p + 1) * ts2]

                        @pl.when(first)
                        def _(p=p, q=q, band_re=band_re, band_im=band_im):
                            scr_re[q, p] = band_re
                            scr_im[q, p] = band_im

                        @pl.when(jnp.logical_not(first))
                        def _(p=p, q=q, band_re=band_re, band_im=band_im):
                            scr_re[q, p] = scr_re[q, p] + band_re
                            scr_im[q, p] = scr_im[q, p] + band_im
                    _flush(cg)
                    return

                if band != "kstack" and polstack:
                    # Polarization-stacked band: all P pols' sample-scaled
                    # V factors concatenate along the OUTPUT lane axis, so
                    # the three Gauss dots run once per chunk at P-fold
                    # output width ((P*ts2, ts2) from one (Mc, P*ts2)
                    # operand) instead of P times — P-fold fewer MXU
                    # launches for full-Stokes work at identical flops
                    # and bitwise-identical sums.
                    prs, pis = [], []
                    for p in range(num_pols):
                        sr = sre_ref[0, g, p][:, None]
                        si = sim_ref[0, g, p][:, None]
                        prs.append(ar * sr - ai * si)
                        pis.append(ar * si + ai * sr)
                    pr_all = jnp.concatenate(prs, axis=1)   # (Mc, P*ts2)
                    pi_all = jnp.concatenate(pis, axis=1)
                    m1 = hdot(pr_all, br)                   # (P*ts2, ts2)
                    m2 = hdot(pi_all, bi)
                    m3 = hdot(pr_all + pi_all, bab)
                    bre_all = m1 - m2
                    bim_all = m3 - m1 - m2
                    for p in range(num_pols):
                        band_re = bre_all[p * ts2:(p + 1) * ts2]
                        band_im = bim_all[p * ts2:(p + 1) * ts2]

                        @pl.when(first)
                        def _(p=p, q=q, band_re=band_re, band_im=band_im):
                            scr_re[q, p] = band_re
                            scr_im[q, p] = band_im

                        @pl.when(jnp.logical_not(first))
                        def _(p=p, q=q, band_re=band_re, band_im=band_im):
                            scr_re[q, p] = scr_re[q, p] + band_re
                            scr_im[q, p] = scr_im[q, p] + band_im
                    _flush(cg)
                    return

                for p in range(num_pols):
                    sr = sre_ref[0, g, p][:, None]
                    si = sim_ref[0, g, p][:, None]
                    if stage == "noband":
                        pr = ar * sr - ai * si
                        pi = ar * si + ai * sr
                        band_re = pr[:ts2, :] + br[:ts2, :]
                        band_im = pi[:ts2, :] + bi[:ts2, :]
                    elif band == "kstack":
                        # t = s * conj(U); band_re = sum vr x tr - vi x ti
                        # = [ar; ai]^T [tr; -ti]; band_im = [ar; ai]^T
                        # [ti; tr].  Same shifted factors as gauss, same
                        # products — only the summation order differs.
                        tr = br * sr - bi * si
                        ti = br * si + bi * sr
                        band_re = hdot(fa, jnp.concatenate([tr, -ti],
                                                           axis=0))
                        band_im = hdot(fa, jnp.concatenate([ti, tr],
                                                           axis=0))
                    else:
                        pr = ar * sr - ai * si
                        pi = ar * si + ai * sr
                        # Gauss 3-multiplication complex product: 25%
                        # fewer MXU flops than 4 dots (or the stacked
                        # 2x2-block dot, which also paid two 0.5 MB VPU
                        # concats per chunk).  The m3-m1-m2 recombination
                        # costs ~1 extra rounding bit on the imaginary
                        # part — measured 1.88e-7 vs 1.73e-7 against the
                        # f64 oracle, still f32 class.
                        m1 = hdot(pr, br)
                        m2 = hdot(pi, bi)
                        m3 = hdot(pr + pi, bab)
                        band_re = m1 - m2
                        band_im = m3 - m1 - m2

                    @pl.when(first)
                    def _(p=p, q=q, band_re=band_re, band_im=band_im):
                        scr_re[q, p] = band_re
                        scr_im[q, p] = band_im

                    @pl.when(jnp.logical_not(first))
                    def _(p=p, q=q, band_re=band_re, band_im=band_im):
                        scr_re[q, p] = scr_re[q, p] + band_re
                        scr_im[q, p] = scr_im[q, p] + band_im

                _flush(cg)

        @pl.when(i == ng - 1)
        def _():
            for qq in range(2):
                @pl.when(state[1 + qq] == 1)
                def _(qq=qq):
                    pltpu.make_async_copy(
                        scr_re.at[qq], _acc_dst(accr_ref, 0),
                        sem_re.at[qq]).wait()
                    pltpu.make_async_copy(
                        scr_im.at[qq], _acc_dst(acci_ref, 0),
                        sem_im.at[qq]).wait()
                    state[1 + qq] = 0

    return kernel


def _grid_chunks_planes(kernel, weights_grid, plan_uv, plan_sub,
                        plan_wp, plan_vis, plan_anchor, plan_valid,
                        dw_chunks, n_chunks, *, pixels: int, ts: int,
                        num_pols: int, interpret: bool):
    """Run the fused gridder kernel; return its raw colour-plane
    accumulators ``(accr, acci)`` — each flat image-layout
    (2, 2, P, ext2, ext2) f32, UNWRITTEN slots uninitialized — plus the
    per-tile occupancy mask (2, 2, nt2, nt2) that marks which slots the
    kernel wrote."""
    K = kernel.shape[-1]
    W, O = kernel.shape[0], kernel.shape[1]
    Np = pixels
    Pp = num_pols
    NC, Mc = plan_wp.shape
    TS2 = 2 * ts
    assert K + ts - 1 <= TS2, "kernel must fit the 2-tile band window"
    ntv = -(-Np // ts) + 1
    nt2 = -(-ntv // 2) + 1
    nslot = 4 * nt2 * nt2
    uv_bias = (K - 1) // 2 - Np // 2

    iu = (plan_wp.astype(jnp.int32) * O + plan_sub[..., 0].astype(jnp.int32))
    iv = (plan_wp.astype(jnp.int32) * O + plan_sub[..., 1].astype(jnp.int32))
    su = jnp.clip(plan_uv[..., 0].astype(jnp.int32) - uv_bias
                  - plan_anchor[:, None, 1], 0, ts - 1)
    sv = jnp.clip(plan_uv[..., 1].astype(jnp.int32) - uv_bias
                  - plan_anchor[:, None, 0], 0, ts - 1)

    # sample = vis * density * valid (the XLA paths' sample_of)
    if dw_chunks is not None:
        dw = dw_chunks
    elif weights_grid is not None:
        _kb = (K - 1) // 2
        wg_pad = jnp.pad(weights_grid, ((0, 0), (0, ts), (0, ts)))

        def dw_of(anc_c, u0r, v0r):
            zero = jnp.zeros((), anc_c.dtype)
            win = lax.dynamic_slice(
                wg_pad, (zero, anc_c[0] + _kb, anc_c[1] + _kb),
                (Pp, ts, ts))
            return win[:, v0r, u0r].T                      # (Mc, P)

        dw = jax.vmap(dw_of)(plan_anchor, su, sv)
    else:
        dw = None
    sample = plan_vis * plan_valid[..., None]
    if dw is not None:
        sample = sample * dw
    sample = jnp.swapaxes(sample, -1, -2)                  # (NC, P, Mc)
    sre = jnp.real(sample).astype(jnp.float32)
    sim = jnp.imag(sample).astype(jnp.float32)

    # conj'd unshifted kernel rows as the stacked bf16-split selection
    # table (one wide selection dot per factor in the kernel).
    tab = _stack_tab(jnp.conj(kernel.reshape(W * O, K)), K, TS2)

    tv = plan_anchor[:, 0] // ts
    tu = plan_anchor[:, 1] // ts
    slot = (((tv & 1) * 2 + (tu & 1)) * (nt2 * nt2)
            + (tv >> 1) * nt2 + (tu >> 1)).astype(jnp.int32)
    if n_chunks is None:
        # Occupied chunks only: trailing padding chunks share anchor
        # (0, 0) and would flush zero runs OVER slot 0's real content.
        n_arr = jnp.sum(jnp.any(plan_valid, axis=-1).astype(jnp.int32)
                        ).reshape(1)
    else:
        n_arr = jnp.asarray(n_chunks, jnp.int32).reshape(1)
    slot = jnp.where(jnp.arange(NC) < n_arr[0], slot, 0)

    G = min(int(os.environ.get("KTPU_PALLAS_G", "16")), NC)
    ng = -(-NC // G)
    NCp = ng * G

    def padc(a):
        return jnp.pad(a, [(0, NCp - NC)] + [(0, 0)] * (a.ndim - 1))

    # Image-layout colour planes, stored flat as four (P, ext2, ext2)
    # images — a flush DMA writes its (P, TS2, TS2) block as a strided
    # slice at the tile position, and the XLA-side combine is four
    # pad-shifted adds fused into ONE elementwise pass (no reshape, no
    # per-colour dynamic-update-slice RMW).
    #
    # The planes are NOT zero-initialized: zeroing the ~600 MB (4k, P=1)
    # slot space cost 4.6% of the production step in the round-4 device
    # profile (aliased zeros broadcasts).  Instead the kernel writes each
    # OCCUPIED slot exactly once (one anchor == one consecutive run ==
    # one full-block flush DMA), and the combine masks unwritten slots
    # with a per-tile occupancy map (jnp.where, so garbage NaNs cannot
    # leak through a multiply).
    ext2 = nt2 * TS2
    acc_shape = (2, 2, Pp, ext2, ext2)

    def im_chunk(i, slot_r, n_r):
        return (i, 0, 0)

    def im_chunk4(i, slot_r, n_r):
        return (i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, G, Mc), im_chunk),      # iu
            pl.BlockSpec((1, G, Mc), im_chunk),      # iv
            pl.BlockSpec((1, G, Mc), im_chunk),      # su
            pl.BlockSpec((1, G, Mc), im_chunk),      # sv
            pl.BlockSpec((1, G, Pp, Mc), im_chunk4),  # sample re
            pl.BlockSpec((1, G, Pp, Mc), im_chunk4),  # sample im
            pl.BlockSpec(memory_space=pltpu.VMEM),   # stacked table
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Pp, TS2, TS2), jnp.float32),
            pltpu.VMEM((2, Pp, TS2, TS2), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    stage = os.environ.get("KTPU_PALLAS_STAGE", "full")
    band = os.environ.get("KTPU_PALLAS_BAND", "gauss")
    accr, acci = pl.pallas_call(
        _make_kernel(Pp, W * O, TS2, Mc, G, NCp, nt2, ng, stage, band),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(acc_shape, jnp.float32),
                   jax.ShapeDtypeStruct(acc_shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(padc(slot), n_arr,
      padc(iu).reshape(ng, G, Mc), padc(iv).reshape(ng, G, Mc),
      padc(su).reshape(ng, G, Mc), padc(sv).reshape(ng, G, Mc),
      padc(sre).reshape(ng, G, Pp, Mc), padc(sim).reshape(ng, G, Pp, Mc),
      tab)

    # Occupancy of each (colour, tile) slot: only occupied chunks' slots
    # were written by the kernel; everything else is uninitialized HBM
    # and must be masked (with where — a multiply would propagate NaNs).
    occ = jnp.zeros((4 * nt2 * nt2,), bool).at[slot].max(
        jnp.arange(NC) < n_arr[0]).reshape(2, 2, nt2, nt2)
    return accr, acci, occ


def grid_chunks_fused(grid_pad, kernel, weights_grid, plan_uv, plan_sub,
                      plan_wp, plan_vis, plan_anchor, plan_valid,
                      dw_chunks=None, n_chunks=None, *, pixels: int,
                      ts: int, interpret: bool | None = None):
    """Fused-Pallas twin of :func:`.mxu_gridder.grid_chunks_dense_impl`.

    Same contract: ``grid_pad`` is the (P, ext, ext) complex padded
    working grid (``dense_pad_size``); anchors tile-aligned; returns the
    updated grid_pad.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Pp = grid_pad.shape[0]
    TS2 = 2 * ts
    accr, acci, occ = _grid_chunks_planes(
        kernel, weights_grid, plan_uv, plan_sub, plan_wp, plan_vis,
        plan_anchor, plan_valid, dw_chunks, n_chunks,
        pixels=pixels, ts=ts, num_pols=Pp, interpret=interpret)
    nt2 = occ.shape[-1]
    ext2 = nt2 * TS2

    # Four pad-shifted colour-plane adds, one fused elementwise pass:
    # dense_pad_size == ts + ext2, so plane (a, b) pads exactly
    # (a*ts, (1-a)*ts) x (b*ts, (1-b)*ts).
    total = grid_pad
    for a in range(2):
        for b in range(2):
            mask = occ[a, b][None, :, None, :, None]
            pr = jnp.where(
                mask, accr[a, b].reshape(Pp, nt2, TS2, nt2, TS2),
                jnp.zeros((), jnp.float32)).reshape(Pp, ext2, ext2)
            pi = jnp.where(
                mask, acci[a, b].reshape(Pp, nt2, TS2, nt2, TS2),
                jnp.zeros((), jnp.float32)).reshape(Pp, ext2, ext2)
            total = total + jnp.pad(
                lax.complex(pr, pi).astype(grid_pad.dtype),
                ((0, 0), (a * ts, ts - a * ts), (b * ts, ts - b * ts)))
    return total


def _make_combine_kernel(ts: int, n: int, ext2: int):
    """Combine kernel body: one (p, ts-row strip, a) grid step adds the
    two column-colour contributions of row-colour ``a`` into the cropped
    (P, N, N) re/im grid planes.

    Colour (a, b)'s plane occupies grid rows [a*ts, a*ts + ext2) x cols
    [b*ts, b*ts + ext2) (see :func:`grid_chunks_fused`); a ts-row output
    strip therefore reads one ts-row strip of each plane (the row shift
    is exactly one block, done in the BlockSpec index map) and the b=1
    column shift is a STATIC ts-lane placement.  Occupancy arrives
    pre-expanded to lanes ((2, 2, nt2, ext2) f32 0/1) and is applied
    with a select so uninitialized slots cannot leak NaNs."""

    def kernel(ar0_ref, ar1_ref, ai0_ref, ai1_ref, ox0_ref, ox1_ref,
               gr_ref, gi_ref):
        i = pl.program_id(1)
        a = pl.program_id(2)

        def sel(blk_ref, ox_ref):
            m = ox_ref[0, 0, 0, 0] > 0.5
            return jnp.where(m[None, :], blk_ref[0, 0, 0],
                             jnp.zeros((), jnp.float32))

        def shift1(x):
            # plane cols [0, n - ts) land at grid cols [ts, n)
            return jnp.pad(x[:, :n - ts], ((0, 0), (ts, 0)))

        # Row strips above a*ts have no row-colour-a contribution (their
        # clamped index map re-reads strip 0; mask it out entirely).
        ok = (i >= a)
        zero = jnp.zeros((), jnp.float32)
        c0r = jnp.where(ok, sel(ar0_ref, ox0_ref)[:, :n], zero)
        c1r = jnp.where(ok, shift1(sel(ar1_ref, ox1_ref)), zero)
        c0i = jnp.where(ok, sel(ai0_ref, ox0_ref)[:, :n], zero)
        c1i = jnp.where(ok, shift1(sel(ai1_ref, ox1_ref)), zero)

        # Accumulate in the SAME order as the XLA combine's sequential
        # colour adds (((p00 + p01) + p10) + p11), so the two paths
        # stay bitwise-identical at f32.
        @pl.when(a == 0)
        def _():
            gr_ref[0] = c0r + c1r
            gi_ref[0] = c0i + c1i

        @pl.when(a != 0)
        def _():
            gr_ref[0] = (gr_ref[0] + c0r) + c1r
            gi_ref[0] = (gi_ref[0] + c0i) + c1i

    return kernel


def combine_planes_fused(accr, acci, occ, *, pixels: int, ts: int,
                         interpret: bool | None = None):
    """Fused colour-plane combine: (accr, acci, occ) -> cropped
    (P, N, N) f32 ``(gr, gi)`` grid planes.

    Replaces the XLA combine of :func:`grid_chunks_fused` for callers
    that want the FFT-input layout directly (no (P, ext, ext) complex64
    materialization, no real/imag re-split): the round-5 sweep-C device
    profile put the XLA combine class at ~10% of the production step,
    far above its ~1 ms memory-speed cost.  NOTE: returns only the
    chunk contribution over the N x N crop — callers with a non-zero
    base grid add it themselves (the cube path's base is zero)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, _, Pp, ext2, _ = accr.shape
    TS2 = 2 * ts
    nt2 = ext2 // TS2
    n = pixels
    assert n % ts == 0 and n <= ext2
    # Singleton sublane axis: TPU lowering requires the block's last two
    # dims divisible by (8, 128) or equal to the array dims.
    occx = jnp.repeat(occ.astype(jnp.float32), TS2, axis=-1)[..., None, :]
    nr = n // ts

    def im_acc(bi):
        def f(p, i, a):
            return (a, bi, p, jnp.maximum(i - a, 0), 0)
        return f

    def im_occ(bi):
        def f(p, i, a):
            return (a, bi, jnp.maximum((i - a) // 2, 0), 0, 0)
        return f

    def im_out(p, i, a):
        return (p, i, 0)

    # Mosaic's default 16 MiB scoped-VMEM cap is just short of the
    # double-buffered block working set at 4k (measured 16.54 MiB on
    # v5e; 32.54 at 8k): four (ts, ext2) input strips + two (ts, n)
    # output strips, double-buffered, plus ~4 MiB of select temporaries
    # and occupancy blocks — 12 MiB of slack covers both measured
    # points with margin.
    vmem_mb = ((4 * ts * ext2 + 2 * ts * n) * 4 * 2) // (1 << 20) + 12
    gr, gi = pl.pallas_call(
        _make_combine_kernel(ts, n, ext2),
        grid=(Pp, nr, 2),
        in_specs=[
            pl.BlockSpec((1, 1, 1, ts, ext2), im_acc(0)),
            pl.BlockSpec((1, 1, 1, ts, ext2), im_acc(1)),
            pl.BlockSpec((1, 1, 1, ts, ext2), im_acc(0)),
            pl.BlockSpec((1, 1, 1, ts, ext2), im_acc(1)),
            pl.BlockSpec((1, 1, 1, 1, ext2), im_occ(0)),
            pl.BlockSpec((1, 1, 1, 1, ext2), im_occ(1)),
        ],
        out_specs=[pl.BlockSpec((1, ts, n), im_out),
                   pl.BlockSpec((1, ts, n), im_out)],
        out_shape=[jax.ShapeDtypeStruct((Pp, n, n), jnp.float32),
                   jax.ShapeDtypeStruct((Pp, n, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(16, vmem_mb) << 20),
        interpret=interpret,
    )(accr, accr, acci, acci, occx, occx)
    return gr, gi


def grid_chunks_fused_parts(kernel, weights_grid, plan_uv, plan_sub,
                            plan_wp, plan_vis, plan_anchor, plan_valid,
                            dw_chunks=None, n_chunks=None, *, pixels: int,
                            ts: int, interpret: bool | None = None):
    """Fused gridder returning cropped (P, N, N) f32 ``(gr, gi)`` planes
    — the fused-FFT input layout — via :func:`combine_planes_fused`
    (no complex64 grid materialization; zero base grid)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Pp = plan_vis.shape[-1]
    accr, acci, occ = _grid_chunks_planes(
        kernel, weights_grid, plan_uv, plan_sub, plan_wp, plan_vis,
        plan_anchor, plan_valid, dw_chunks, n_chunks,
        pixels=pixels, ts=ts, num_pols=Pp, interpret=interpret)
    return combine_planes_fused(accr, acci, occ, pixels=pixels, ts=ts,
                                interpret=interpret)


def _make_degrid_kernel(num_pols: int, wo: int, ts2: int, ts2l: int,
                        mc: int, gc: int, ng: int):
    """Fused degrid kernel body: per chunk, DMA the (P, ts2, ts2l) model
    window at the scalar-prefetched anchor (double-buffered one chunk
    ahead), assemble the UNCONJUGATED tap factors in VMEM and evaluate
    the bilinear prediction ``pred[m] = sum_{jk} kv[m,j] W[j,k] ku[m,k]``
    as a Gauss 3-dot complex product plus a VPU row reduction (grid
    parity: reference degrid.mako / grid.py:1138-1155 accumulate the
    identical tap-weighted window sums per visibility)."""

    ts = ts2 // 2

    def kernel(av_ref, au_ref, ar_ref, n_ref, iu_ref, iv_ref, su_ref,
               sv_ref, gr_ref, gi_ref, tab_ref, outr_ref, outi_ref,
               win_re, win_im, sem_re, sem_im):
        i = pl.program_id(0)
        n = n_ref[0]

        def win_dma(cg, q):
            # Row anchors arrive as TILE indices (x ts here, ts % 8 == 0
            # so the sublane offset is provably aligned); column anchors
            # arrive PRE-DIVIDED by the 128-lane tiling (x 128 here) with
            # the ts-level remainder selecting the effective window slice
            # (``win_eff``), because Mosaic must PROVE the lane offset
            # divisible by 128 and ``t * ts`` with ts == 64 is not
            # (measured: 8k cube / 4k cube_e2e compile failures, round 5
            # sweeps A and B).
            src_r = gr_ref.at[:, pl.ds(av_ref[cg] * ts, ts2),
                              pl.ds(au_ref[cg] * 128, ts2l)]
            src_i = gi_ref.at[:, pl.ds(av_ref[cg] * ts, ts2),
                              pl.ds(au_ref[cg] * 128, ts2l)]
            return (pltpu.make_async_copy(src_r, win_re.at[q],
                                          sem_re.at[q]),
                    pltpu.make_async_copy(src_i, win_im.at[q],
                                          sem_im.at[q]))

        @pl.when(jnp.logical_and(i == 0, n > 0))
        def _():
            for cp in win_dma(0, 0):
                cp.start()

        for g in range(gc):
            cg = i * gc + g

            @pl.when(cg < n)
            def _(g=g, cg=cg):
                q = cg & 1
                # The window for THIS chunk was started at chunk cg-1
                # (or the prologue); wait it, then prefetch cg+1.
                for cp in win_dma(cg, q):
                    cp.wait()

                @pl.when(cg + 1 < n)
                def _():
                    for cp in win_dma(cg + 1, 1 - q):
                        cp.start()

                ur, ui = _select_shift(tab_ref, iu_ref[0, g],
                                       su_ref[0, g], mc, wo, ts2)
                vr, vi = _select_shift(tab_ref, iv_ref[0, g],
                                       sv_ref[0, g], mc, wo, ts2)
                uab = ur + ui
                dnk = (((1,), (1,)), ((), ()))   # contract the k axis

                def hdot(x, y):
                    return lax.dot_general(
                        x, y, dnk, preferred_element_type=jnp.float32,
                        precision=_HI)

                def win_eff(wref):
                    # The DMA'd window starts at the 128-aligned column
                    # below the anchor; the anchor's ts2-wide window is
                    # the static ts2-column slice at the remainder, one
                    # of the 128//ts static candidates selected by the
                    # prefetched per-chunk scalar.  Static lane-offset
                    # slices + scalar selects compile where a dynamic
                    # lane gather wider than one vreg does not (Mosaic:
                    # "Multiple source vregs along gather dimension").
                    w = wref[:, 0:ts2]
                    for r in range(ts, 128, ts):
                        if r + ts2 <= ts2l:
                            w = jnp.where(ar_ref[cg] == r,
                                          wref[:, r:r + ts2], w)
                    return w

                for p in range(num_pols):
                    wr = win_eff(win_re[q, p])
                    wi = win_eff(win_im[q, p])
                    # B[m, j] = sum_k W[j, k] ku[m, k] (complex, Gauss)
                    m1 = hdot(ur, wr)
                    m2 = hdot(ui, wi)
                    m3 = hdot(uab, wr + wi)
                    b_re = m1 - m2
                    b_im = m3 - m1 - m2
                    outr_ref[0, g, p, :] = jnp.sum(
                        vr * b_re - vi * b_im, axis=1)
                    outi_ref[0, g, p, :] = jnp.sum(
                        vr * b_im + vi * b_re, axis=1)

    return kernel


def degrid_chunks_fused(grid, kernel, plan_uv, plan_sub, plan_wp,
                        plan_anchor, n_chunks=None, *, pixels: int,
                        ts: int, interpret: bool | None = None):
    """Fused-Pallas model prediction for tiled chunk plans.

    ``grid`` is the (P, >=N, >=N) complex model grid — or an f32
    ``(gre, gim)`` pair (the :func:`.pallas_fft.image_to_grid_fused_parts`
    output, avoiding the complex64 round-trip).  Any padding; it is
    re-padded to ``dense_pad_size`` here so every anchor's 2-tile window
    is in range.  Returns predicted (NC, Mc, P) complex64 (callers mask
    by ``valid`` and apply weights)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    K = kernel.shape[-1]
    W, O = kernel.shape[0], kernel.shape[1]
    Np = pixels
    parts = isinstance(grid, tuple)
    Pp = (grid[0] if parts else grid).shape[0]
    NC, Mc = plan_wp.shape
    TS2 = 2 * ts
    assert K + ts - 1 <= TS2, "kernel must fit the 2-tile band window"
    assert ts % 8 == 0, "row DMA offsets must be sublane-aligned"
    # The window's lane (u) extent: when ts is not a multiple of the
    # 128-lane tiling, the DMA starts at the aligned column BELOW the
    # anchor and the remainder is folded into the u tap shift, so the
    # window must carry one extra lane tile (Mosaic alignment proof).
    TS2L = TS2 if ts % 128 == 0 else TS2 + 128
    from .mxu_gridder import dense_pad_size

    ext = dense_pad_size(Np, ts)

    def padg(g):
        return jnp.pad(g, ((0, 0), (0, ext - g.shape[1]),
                           (0, ext + (TS2L - TS2) - g.shape[2])))

    if parts:
        gre = padg(grid[0].astype(jnp.float32))
        gim = padg(grid[1].astype(jnp.float32))
    else:
        gpad = padg(grid)
        gre = jnp.real(gpad).astype(jnp.float32)
        gim = jnp.imag(gpad).astype(jnp.float32)

    uv_bias = (K - 1) // 2 - Np // 2
    iu = (plan_wp.astype(jnp.int32) * O + plan_sub[..., 0].astype(jnp.int32))
    iv = (plan_wp.astype(jnp.int32) * O + plan_sub[..., 1].astype(jnp.int32))
    # bbox (non-tiled) plans bound offsets by ts inclusive; anything up
    # to TS2 - K keeps the shifted taps inside the window.
    sh_max = TS2 - K
    # Column anchors DMA from the 128-aligned column at/below the anchor;
    # the remainder (a multiple of ts, < 128) selects the anchor's
    # ts2-wide slice of the TS2L-wide window inside the kernel.
    au_px = jnp.clip(plan_anchor[:, 1].astype(jnp.int32), 0, ext - TS2)
    au_rem = au_px % 128
    su = jnp.clip(plan_uv[..., 0].astype(jnp.int32) - uv_bias
                  - plan_anchor[:, None, 1], 0, sh_max)
    sv = jnp.clip(plan_uv[..., 1].astype(jnp.int32) - uv_bias
                  - plan_anchor[:, None, 0], 0, sh_max)

    # UNCONJUGATED rows: degrid applies the taps directly
    # (reference grid.py:1138-1155).
    tab = _stack_tab(kernel.reshape(W * O, K), K, TS2)

    if n_chunks is None:
        n_arr = jnp.asarray(NC, jnp.int32).reshape(1)
    else:
        n_arr = jnp.asarray(n_chunks, jnp.int32).reshape(1)

    G = min(int(os.environ.get("KTPU_PALLAS_G", "16")), NC)
    ng = -(-NC // G)
    NCp = ng * G

    def padc(a):
        return jnp.pad(a, [(0, NCp - NC)] + [(0, 0)] * (a.ndim - 1))

    # Pre-divided DMA indices (rows in ts-tiles, columns in 128-lane
    # tiles): the kernel rescales by the matching constants so Mosaic can
    # PROVE the HBM slice offsets (8, 128)-aligned.
    av = jnp.clip(padc(plan_anchor[:, 0]).astype(jnp.int32), 0,
                  ext - TS2) // ts
    au = padc(au_px) // 128
    ar = padc(au_rem)

    def im_chunk(i, av_r, au_r, ar_r, n_r):
        return (i, 0, 0)

    def im_out(i, av_r, au_r, ar_r, n_r):
        return (i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, G, Mc), im_chunk),      # iu
            pl.BlockSpec((1, G, Mc), im_chunk),      # iv
            pl.BlockSpec((1, G, Mc), im_chunk),      # su
            pl.BlockSpec((1, G, Mc), im_chunk),      # sv
            pl.BlockSpec(memory_space=pl.ANY),       # grid re
            pl.BlockSpec(memory_space=pl.ANY),       # grid im
            pl.BlockSpec(memory_space=pltpu.VMEM),   # stacked table
        ],
        out_specs=[
            pl.BlockSpec((1, G, Pp, Mc), im_out),
            pl.BlockSpec((1, G, Pp, Mc), im_out),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, Pp, TS2, TS2L), jnp.float32),
            pltpu.VMEM((2, Pp, TS2, TS2L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    pre, pim = pl.pallas_call(
        _make_degrid_kernel(Pp, W * O, TS2, TS2L, Mc, G, ng),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ng, G, Pp, Mc), jnp.float32),
                   jax.ShapeDtypeStruct((ng, G, Pp, Mc), jnp.float32)],
        interpret=interpret,
    )(av, au, ar, n_arr,
      padc(iu).reshape(ng, G, Mc), padc(iv).reshape(ng, G, Mc),
      padc(su).reshape(ng, G, Mc), padc(sv).reshape(ng, G, Mc),
      gre, gim, tab)
    pred = lax.complex(pre, pim).reshape(NCp, Pp, Mc)[:NC]
    return jnp.swapaxes(pred, -1, -2)                  # (NC, Mc, P)
