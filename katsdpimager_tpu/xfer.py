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
    complex array (which must not itself be fetched directly)."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return _combine(jnp.asarray(x.astype(np.float32)),
                        jnp.zeros(x.shape, jnp.float32))
    return _combine(jnp.asarray(np.ascontiguousarray(x.real, np.float32)),
                    jnp.asarray(np.ascontiguousarray(x.imag, np.float32)))


def fetch_complex(z) -> np.ndarray:
    """Fetch a device complex array via real/imag planes."""
    re, im = _split(z)
    return np.asarray(re) + 1j * np.asarray(im)


def fetch(x) -> np.ndarray:
    """Fetch any device array, routing complex through the pair path."""
    if jnp.iscomplexobj(x):
        return fetch_complex(x)
    return np.asarray(x)
