"""Fused Pallas four-step FFT vs numpy and the XLA transform formulation
(interpret mode on CPU; the kernels compile for TPU via Mosaic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from katsdpimager_tpu.ops import fourier, pallas_fft


@pytest.mark.parametrize("N", [256, 512])
@pytest.mark.parametrize("sign", [-1, +1])
def test_fft2_matches_numpy(N, sign):
    rng = np.random.default_rng(5)
    x = (rng.normal(size=(2, N, N))
         + 1j * rng.normal(size=(2, N, N))).astype(np.complex64)
    if sign == -1:
        ref = np.fft.fft2(x)
    else:
        ref = np.fft.ifft2(x) * (N * N)   # unnormalised inverse
    got = np.asarray(pallas_fft.fft2_pallas(jnp.asarray(x), sign=sign))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref.astype(np.complex64),
                               atol=2e-6 * scale)


def test_grid_to_image_fused_matches_xla():
    rng = np.random.default_rng(6)
    N, P = 256, 2
    grid = (rng.normal(size=(P, N, N))
            + 1j * rng.normal(size=(P, N, N))).astype(np.complex64)
    img = rng.normal(size=(P, N, N)).astype(np.float32)
    k1d = (0.5 + rng.uniform(0.2, 1.0, size=N)).astype(np.float32)
    w, ps = 123.0, 1.0 / (N * 16)
    ref = np.asarray(fourier.grid_to_image_impl(
        jnp.asarray(grid), jnp.asarray(img), jnp.asarray(k1d), w, ps,
        pixels=N))
    outT = pallas_fft.grid_to_image_fused(
        jnp.asarray(grid), jnp.asarray(np.swapaxes(img, -1, -2)), k1d, w,
        ps, pixels=N)
    got = np.swapaxes(np.asarray(outT), -1, -2)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-6 * scale)


def test_image_to_grid_fused_matches_xla():
    rng = np.random.default_rng(7)
    N, P = 256, 1
    img = rng.normal(size=(P, N, N)).astype(np.float32)
    k1d = (0.5 + rng.uniform(0.2, 1.0, size=N)).astype(np.float32)
    w, ps = 77.0, 1.0 / (N * 16)
    ref = np.asarray(fourier.image_to_grid_impl(
        jnp.asarray(img), jnp.asarray(k1d), w, ps, pixels=N))
    got = np.asarray(pallas_fft.image_to_grid_fused(
        jnp.asarray(np.swapaxes(img, -1, -2)), k1d, w, ps, pixels=N))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=2e-6 * scale)


def test_env_routing(monkeypatch):
    """KTPU_FFT=pallas routes the impl functions through the fused
    kernels with identical results (and leaves f64 on the XLA path)."""
    rng = np.random.default_rng(8)
    N = 256
    grid = (rng.normal(size=(1, N, N))
            + 1j * rng.normal(size=(1, N, N))).astype(np.complex64)
    img = rng.normal(size=(1, N, N)).astype(np.float32)
    k1d = (0.5 + rng.uniform(0.2, 1.0, size=N)).astype(np.float32)
    w, ps = 9.0, 1.0 / (N * 16)
    ref = np.asarray(fourier.grid_to_image_impl(
        jnp.asarray(grid), jnp.asarray(img), jnp.asarray(k1d), w, ps,
        pixels=N))
    monkeypatch.setenv("KTPU_FFT", "pallas")
    got = np.asarray(fourier.grid_to_image_impl(
        jnp.asarray(grid), jnp.asarray(img), jnp.asarray(k1d), w, ps,
        pixels=N))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, atol=5e-6 * scale)
    # f64 images and non-power-of-two sizes must keep the XLA path
    # (jnp.asarray downcasts f64 without x64 mode, so probe the guard)
    assert not fourier._use_pallas_fft(256, np.float64)
    assert not fourier._use_pallas_fft(256, np.complex128)
    assert not fourier._use_pallas_fft(192, np.float32)
    assert fourier._use_pallas_fft(256, np.float32, np.complex64)


def test_parts_impls_match(monkeypatch):
    """The f32-parts entry points (the gridder-combine/degrid layout)
    match the complex impls on the fused path."""
    rng = np.random.default_rng(9)
    N = 256
    gr = rng.normal(size=(1, N, N)).astype(np.float32)
    gi = rng.normal(size=(1, N, N)).astype(np.float32)
    img = rng.normal(size=(1, N, N)).astype(np.float32)
    k1d = (0.5 + rng.uniform(0.2, 1.0, size=N)).astype(np.float32)
    w, ps = 21.0, 1.0 / (N * 16)
    monkeypatch.setenv("KTPU_FFT", "pallas")
    ref = np.asarray(fourier.grid_to_image_impl(
        jnp.asarray(gr + 1j * gi), jnp.asarray(img), jnp.asarray(k1d),
        w, ps, pixels=N))
    got = np.asarray(fourier.grid_to_image_parts_impl(
        jnp.asarray(gr), jnp.asarray(gi), jnp.asarray(img),
        jnp.asarray(k1d), w, ps, pixels=N))
    np.testing.assert_array_equal(got, ref)
    gref = np.asarray(fourier.image_to_grid_impl(
        jnp.asarray(img), jnp.asarray(k1d), w, ps, pixels=N))
    pr, pi = fourier.image_to_grid_parts_impl(
        jnp.asarray(img), jnp.asarray(k1d), w, ps, pixels=N)
    np.testing.assert_array_equal(np.asarray(pr), gref.real)
    np.testing.assert_array_equal(np.asarray(pi), gref.imag)
