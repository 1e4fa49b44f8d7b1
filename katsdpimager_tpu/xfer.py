"""Host<->device transfer helpers.

The experimental axon TPU tunnel used in this environment cannot transfer
complex64 arrays across the host-device boundary (in-jit complex compute is
fine).  These helpers move complex data as float32 pairs and combine/split
on device, which is correct (and near-free) on every backend, so they are
used unconditionally wherever complex arrays cross the boundary.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def _combine(re, im):
    return lax.complex(re, im)


@jax.jit
def _split(z):
    return jnp.real(z), jnp.imag(z)


def device_complex(x) -> jnp.ndarray:
    """Upload a complex array as float pairs; returns a device-resident
    complex array (which must not itself be fetched directly).  Preserves
    precision: complex128 crosses as float64 pairs (when x64 is enabled)."""
    x = np.asarray(x)
    rdt = np.float64 if (x.dtype in (np.complex128, np.float64)
                         and jax.config.jax_enable_x64) else np.float32
    if not np.iscomplexobj(x):
        return _combine(jnp.asarray(x.astype(rdt)),
                        jnp.zeros(x.shape, rdt))
    return _combine(jnp.asarray(np.ascontiguousarray(x.real, rdt)),
                    jnp.asarray(np.ascontiguousarray(x.imag, rdt)))


def fetch_complex(z) -> np.ndarray:
    """Fetch a device complex array via real/imag planes."""
    re, im = _split(z)
    return np.asarray(re) + 1j * np.asarray(im)


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("shape", "dtype"))
def _zeros(shape, dtype):
    return jnp.zeros(shape, dtype)


def device_zeros(shape, dtype) -> jnp.ndarray:
    """Complex-safe zeros: created inside jit so no complex constant
    crosses the host-device boundary (eager jnp.zeros would transfer the
    fill scalar as a buffer, which the axon tunnel rejects)."""
    return _zeros(tuple(int(s) for s in shape), jnp.dtype(dtype))


@_partial(jax.jit, static_argnames=("pad_y", "pad_x"))
def _pad_hl(x, pad_y, pad_x):
    return jnp.pad(x, ((0, 0), (0, pad_y), (0, pad_x)))


def device_pad(x, pad_y: int, pad_x: int) -> jnp.ndarray:
    """Complex-safe trailing zero-pad of a (P, H, W) device array."""
    return _pad_hl(x, pad_y=int(pad_y), pad_x=int(pad_x))


@_partial(jax.jit, static_argnames=("pad_rows",))
def _pad_rows(x, pad_rows):
    return jnp.pad(x, [(0, pad_rows)] + [(0, 0)] * (x.ndim - 1))


def device_pad_rows(x, pad_rows: int) -> jnp.ndarray:
    """Complex-safe zero-pad of the leading axis."""
    return _pad_rows(x, pad_rows=int(pad_rows))


def fetch(x) -> np.ndarray:
    """Fetch any device array, routing complex through the pair path."""
    if jnp.iscomplexobj(x):
        return fetch_complex(x)
    return np.asarray(x)

def enable_compilation_cache():
    """Persist XLA compiles next to the repo (compiles through the axon
    tunnel take minutes; see doc/PERFORMANCE.md)."""
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
