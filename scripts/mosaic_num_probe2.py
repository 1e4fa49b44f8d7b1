"""Follow-up: is split3 broken on TPU XLA, or the in-kernel bf16 dot?

  D. pure-XLA recombine: does hi+mid+lo == x on the TPU backend?
  E. in-kernel recombine of pre-split planes WITHOUT a dot (direct read).
  F. the selection dot but output sel raw; compare each third against the
     host-side expected hi/mid/lo selections.

Usage: python scripts/mosaic_num_probe2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

_INTERP = jax.default_backend() != "tpu"
M, W, L = 256, 256, 128

rng = np.random.default_rng(0)
table = rng.normal(size=(W, L)).astype(np.float32)
idx = rng.integers(0, W, size=M).astype(np.int32)


def split3(x):
    # reduce_precision: XLA folds plain bf16 round-trips away on TPU
    # (probe D measured hi == x, mid == lo == 0 with the astype form).
    hi = lax.reduce_precision(x, 8, 7)
    r1 = x - hi
    mid = lax.reduce_precision(r1, 8, 7)
    lo = lax.reduce_precision(r1 - mid, 8, 7)
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def split3_np(x):
    import ml_dtypes
    hi = x.astype(ml_dtypes.bfloat16)
    r1 = x - hi.astype(np.float32)
    mid = r1.astype(ml_dtypes.bfloat16)
    lo = (r1 - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, mid, lo


def probe_d():
    @jax.jit
    def run(x):
        hi, mid, lo = split3(x)
        return (hi.astype(jnp.float32) + mid.astype(jnp.float32)
                + lo.astype(jnp.float32))

    out = np.asarray(run(jnp.asarray(table)))
    err = np.max(np.abs(out - table)) / np.max(np.abs(table))
    print(f"D XLA split3 recombine: rel err {err:.3e}", flush=True)

    # also compare device split against the host split plane by plane
    @jax.jit
    def planes(x):
        hi, mid, lo = split3(x)
        return (hi.astype(jnp.float32), mid.astype(jnp.float32),
                lo.astype(jnp.float32))

    dev = [np.asarray(p) for p in planes(jnp.asarray(table))]
    host = [np.asarray(p).astype(np.float32) for p in split3_np(table)]
    for name, dp, hp in zip("hi mid lo".split(), dev, host):
        err = np.max(np.abs(dp - hp)) / max(np.max(np.abs(hp)), 1e-30)
        print(f"D device-vs-host split {name}: rel err {err:.3e}",
              flush=True)


def probe_e():
    def kern(tab_ref, out_ref):
        out_ref[:] = (tab_ref[:, :L].astype(jnp.float32)
                      + tab_ref[:, L:2 * L].astype(jnp.float32)
                      + tab_ref[:, 2 * L:].astype(jnp.float32))

    @jax.jit
    def run(x):
        hi, mid, lo = split3(x)
        tab = jnp.concatenate([hi, mid, lo], axis=1)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((W, L), jnp.float32),
            interpret=_INTERP,
        )(tab)

    out = np.asarray(run(jnp.asarray(table)))
    err = np.max(np.abs(out - table)) / np.max(np.abs(table))
    print(f"E in-kernel direct recombine: rel err {err:.3e}", flush=True)


def probe_f():
    def kern(idx_ref, tab_ref, out_ref):
        onehot = (idx_ref[:, 0][:, None] == lax.broadcasted_iota(
            jnp.int32, (M, W), 1)).astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(onehot, tab_ref[:],
                             preferred_element_type=jnp.float32)

    @jax.jit
    def run(x, idxj):
        hi, mid, lo = split3(x)
        tab = jnp.concatenate([hi, mid, lo], axis=1)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, 3 * L), jnp.float32),
            interpret=_INTERP,
        )(idxj[:, None], tab)

    out = np.asarray(run(jnp.asarray(table), jnp.asarray(idx)))
    host = [np.asarray(p).astype(np.float32)[idx]
            for p in split3_np(table)]
    for k, name in enumerate("hi mid lo".split()):
        err = (np.max(np.abs(out[:, k * L:(k + 1) * L] - host[k]))
               / max(np.max(np.abs(host[k])), 1e-30))
        print(f"F selected {name}: rel err {err:.3e}", flush=True)


if __name__ == "__main__":
    probe_d()
    probe_e()
    probe_f()
