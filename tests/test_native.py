"""Native (C++/OpenMP) preprocessing core vs the JAX path."""

import numpy as np
import pytest

from katsdpimager_tpu import native, polarization, preprocess
from tests.test_preprocess import make_params

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def random_inputs(rng, n=2000, Q=4):
    uvw = rng.uniform(-4000, 4000, size=(n, 3)).astype(np.float32)
    vis = (rng.normal(size=(1, n, Q)) + 1j * rng.normal(size=(1, n, Q))
           ).astype(np.complex64)
    weights = rng.uniform(0.5, 2.0, size=(1, n, Q)).astype(np.float32)
    # flag ~5%
    flags = rng.uniform(size=(1, n, Q)) < 0.05
    weights[flags] = 0.0
    return uvw, weights, vis


def compare_collectors(ip, gp, uvw, weights, vis, mueller, **kwargs):
    cj = preprocess.VisibilityCollectorMem([ip], [gp])
    cj.add(uvw, weights, vis, mueller_stokes=mueller, **kwargs)
    cn = preprocess.VisibilityCollectorNative([ip], [gp])
    cn.add(uvw, weights, vis, mueller_stokes=mueller, **kwargs)
    assert cn.num_output == cj.num_output
    for s in range(gp.w_slices):
        a = cj.reader().slice_arrays(0, s)
        b = cn.reader().slice_arrays(0, s)
        assert len(a) == len(b)
        if len(a) == 0:
            continue
        # Both sorted by the same key order
        np.testing.assert_array_equal(a.uv, b.uv)
        np.testing.assert_array_equal(a.sub_uv, b.sub_uv)
        np.testing.assert_array_equal(a.w_plane, b.w_plane)
        np.testing.assert_allclose(a.weights, b.weights, rtol=1e-5)
        np.testing.assert_allclose(a.vis, b.vis, rtol=1e-4, atol=1e-5)


def test_native_matches_jax_stokes_i():
    ip, gp = make_params(pixels=2048, cell_size=10.0)
    rng = np.random.default_rng(31)
    uvw, weights, vis = random_inputs(rng)
    mueller = polarization.polarization_matrix(
        [polarization.STOKES_I],
        [polarization.STOKES_XX, polarization.STOKES_XY,
         polarization.STOKES_YX, polarization.STOKES_YY])
    compare_collectors(ip, gp, uvw, weights, vis, mueller)


def test_native_matches_jax_iquv():
    ip, gp = make_params(pixels=2048, cell_size=10.0,
                         pols=tuple(polarization.STOKES_IQUV))
    rng = np.random.default_rng(37)
    uvw, weights, vis = random_inputs(rng)
    mueller = polarization.polarization_matrix(
        polarization.STOKES_IQUV,
        [polarization.STOKES_XX, polarization.STOKES_XY,
         polarization.STOKES_YX, polarization.STOKES_YY])
    compare_collectors(ip, gp, uvw, weights, vis, mueller)


def test_native_parallactic():
    ip, gp = make_params(pixels=2048, cell_size=10.0)
    rng = np.random.default_rng(41)
    uvw, weights, vis = random_inputs(rng, n=500)
    from_c, to_c = polarization.polarization_matrices(
        [polarization.STOKES_I],
        [polarization.STOKES_XX, polarization.STOKES_XY,
         polarization.STOKES_YX, polarization.STOKES_YY])
    fa1 = rng.uniform(-1, 1, 500).astype(np.float32)
    fa2 = rng.uniform(-1, 1, 500).astype(np.float32)
    compare_collectors(ip, gp, uvw, weights, vis, from_c,
                       feed_angle1=fa1, feed_angle2=fa2,
                       mueller_circular=to_c)


def test_native_merging():
    ip, gp = make_params()
    uvw = np.array([[343.0, 100.0, 10.0],
                    [50.0, 50.0, 10.0],
                    [343.02, 100.01, 10.0]], np.float32)
    vis = np.array([[[1 + 1j], [5 + 0j], [2 - 1j]]], np.complex64)
    weights = np.array([[[1.0], [1.0], [3.0]]], np.float32)
    mueller = np.eye(1, dtype=np.complex64)
    c = preprocess.VisibilityCollectorNative([ip], [gp])
    c.add(uvw, weights, vis, mueller_stokes=mueller)
    assert c.num_output == 2


def test_engine_param_hdf5_spill(tmp_path):
    """engine="native" composes with HDF5 spill storage (the cube
    pipeline's auto configuration on an accelerator backend)."""
    ip, gp = make_params()
    rng = np.random.default_rng(11)
    uvw, weights, vis = random_inputs(rng, n=800, Q=1)
    mueller = polarization.polarization_matrix(
        [polarization.STOKES_I], [polarization.STOKES_I])
    cj = preprocess.VisibilityCollectorMem([ip], [gp], engine="jax")
    cj.add(uvw, weights, vis, mueller_stokes=mueller)
    cj.close()
    cn = preprocess.VisibilityCollectorHDF5(
        str(tmp_path / "spill.h5"), [ip], [gp], engine="native")
    cn.add(uvw, weights, vis, mueller_stokes=mueller)
    cn.close()
    assert cn.num_output == cj.num_output
    for s in range(gp.w_slices):
        a = cj.reader().slice_arrays(0, s)
        b = cn.reader().slice_arrays(0, s)
        assert len(a) == len(b)
        if len(a):
            np.testing.assert_array_equal(a.uv, b.uv)
            np.testing.assert_allclose(a.vis, b.vis, rtol=1e-4, atol=1e-5)


def test_native_heavy_merge_and_radix_stress():
    """Many duplicated quantized coordinates: stresses the radix sort's
    digit-skip on a coarse grid (few occupied key bits) and the parallel
    run-merge with long runs spanning thread-partition boundaries."""
    ip, gp = make_params(pixels=256, cell_size=50.0)
    rng = np.random.default_rng(43)
    n = 50_000
    # Draw UVW from a tiny set of distinct points so runs are thousands long.
    pool = rng.uniform(-1500, 1500, size=(37, 3)).astype(np.float32)
    uvw = pool[rng.integers(0, len(pool), n)]
    vis = (rng.normal(size=(1, n, 4)) + 1j * rng.normal(size=(1, n, 4))
           ).astype(np.complex64)
    weights = rng.uniform(0.5, 2.0, size=(1, n, 4)).astype(np.float32)
    mueller = polarization.polarization_matrix(
        [polarization.STOKES_I],
        [polarization.STOKES_XX, polarization.STOKES_XY,
         polarization.STOKES_YX, polarization.STOKES_YY])
    compare_collectors(ip, gp, uvw, weights, vis, mueller)


def test_native_all_flagged_is_empty():
    ip, gp = make_params()
    uvw = np.zeros((10, 3), np.float32)
    vis = np.ones((1, 10, 1), np.complex64)
    weights = np.zeros((1, 10, 1), np.float32)   # all flagged
    c = preprocess.VisibilityCollectorNative([ip], [gp])
    c.add(uvw, weights, vis, mueller_stokes=np.eye(1, dtype=np.complex64))
    assert c.num_output == 0
