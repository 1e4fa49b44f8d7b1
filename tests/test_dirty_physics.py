"""Physics validation: the gridded+FFT dirty image must match a brute-force
DFT of the same (quantized) visibilities.

This bounds the systematic error of the whole W-projection chain — kernel
tabulation, taper division, n multiplication, per-slice mid-w phase — in one
assertion, independent of CLEAN and of the oracles used elsewhere.
"""

import numpy as np
import pytest

from katsdpimager_tpu import imaging, loader, parameters, polarization, preprocess, simulate
from katsdpimager_tpu.ops import clean as clean_ops
from katsdpimager_tpu.ops import predict as predict_ops
from katsdpimager_tpu.ops import weights as weight_ops


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sim") / "phys.h5")
    simulate.make_sim_dataset(path, num_antennas=12, num_times=12,
                              num_channels=1, max_radius=600.0)
    ds = loader.load(path, [])
    fixed = parameters.FixedImageParameters((polarization.STOKES_I,))
    array_p = ds.array_parameters()
    ip = parameters.make_image_parameters(fixed, 1.0, 5.0, ds.frequency(0),
                                          array_p, pixels=512)
    fgp = parameters.FixedGridParameters(
        7.0, 8, 4, array_p.longest_baseline, 16)
    n_slices = parameters.w_slices(ip, fgp.max_w, 0.001, 16, 7.0)
    gp = parameters.GridParameters(fgp, n_slices, 4)
    mueller = polarization.polarization_matrix(
        [polarization.STOKES_I], ds.polarizations())
    coll = preprocess.VisibilityCollectorMem([ip], [gp])
    for chunk in ds.data_iter(0, 1):
        coll.add(chunk["uvw"], chunk["weights"], chunk["vis"],
                 mueller_stokes=mueller)
    ds.close()
    return ip, gp, coll.reader()


def brute_force_dirty(ip, gp, reader, ys, xs):
    """Direct DFT dirty image at selected pixels, from the dequantized
    coordinates the gridder actually uses."""
    uv_scale, w_scale, w_bias = predict_ops.uvw_scale_bias(ip, gp)
    px = float(ip.pixel_size)
    l = (np.asarray(xs) - ip.pixels // 2) * px
    m = (np.asarray(ys) - ip.pixels // 2) * px
    n = np.sqrt(1 - l * l - m * m)

    acc = np.zeros(len(l))
    wsum = 0.0
    for s in range(gp.w_slices):
        chk = reader.slice_arrays(0, s)
        if len(chk) == 0:
            continue
        u = (chk.uv[:, 0].astype(np.float64) * gp.fixed.oversample
             + chk.sub_uv[:, 0] + 0.5) * uv_scale
        v = (chk.uv[:, 1].astype(np.float64) * gp.fixed.oversample
             + chk.sub_uv[:, 1] + 0.5) * uv_scale
        w = chk.w_plane.astype(np.float64) * w_scale + w_bias
        # add the slice mid-w: full dequantized w
        from katsdpimager_tpu.ops import wkernel

        w = w + wkernel.mid_w_values(ip, gp)[s]
        vis = chk.vis[:, 0]  # pre-weighted
        # dirty(l,m) = n * sum_i Re[vis_i e^{+2pi i (ul+vm+w(n-1))}]
        phase = (np.outer(l, u) + np.outer(m, v)
                 + np.outer(n - 1.0, w))
        acc += (np.exp(2j * np.pi * phase) @ vis).real
        wsum += chk.weights[:, 0].sum()
    return n * acc / wsum


def test_dirty_matches_brute_force(setup):
    ip, gp, reader = setup
    wp = parameters.WeightParameters(weight_ops.WeightType.NATURAL)
    cp = parameters.CleanParameters(10, 0.1, 0.85, 5.0, clean_ops.CLEAN_I,
                                    0.01, 0.5, 0.02)
    im = imaging.Imaging(ip, gp, wp, cp)
    im.clear_weights()
    im.finalize_weights()
    im.clear_dirty()
    for s in range(gp.w_slices):
        if reader.len(0, s) == 0:
            continue
        im.clear_grid()
        chk = reader.slice_arrays(0, s)
        im.grid_slice(chk, chk.vis, s)
        im.grid_to_image(s)
    # normalise by the PSF peak (sum of weights convention)
    wsum = sum(reader.slice_arrays(0, s).weights[:, 0].sum()
               for s in range(gp.w_slices))
    dirty = np.asarray(im.dirty)[0] / wsum

    # Sample a grid of interior pixels (centre + off-centre, avoiding the
    # tapered edge)
    ys, xs = np.meshgrid(np.arange(96, 416, 32), np.arange(96, 416, 32),
                         indexing="ij")
    ys, xs = ys.ravel(), xs.ravel()
    expected = brute_force_dirty(ip, gp, reader, ys, xs)
    got = dirty[ys, xs]
    scale = np.abs(expected).max()
    # Kernel truncation (eps_w=1e-3), subpixel quantization of the
    # evaluation grid and taper approximation bound the agreement.
    np.testing.assert_allclose(got, expected, atol=5e-3 * scale)
