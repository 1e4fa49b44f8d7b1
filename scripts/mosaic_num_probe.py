"""Isolate Mosaic numerics: which fused-gridder pattern loses precision?

Three minimal pallas_call probes, each compared against exact f32 math
on host:

  A. one-hot bf16 selection of a 3-way bf16-split table (one wide dot,
     preferred f32) then hi+mid+lo recombine — expects EXACT f32.
  B. one-hot f32 selection at precision=HIGHEST from an f32 table.
  C. stacked real band dot at HIGHEST: [ar, ai]^T [br, bi] 2x2 blocks vs
     four separate HIGHEST dots.

Usage: python scripts/mosaic_num_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

_INTERP = jax.default_backend() != "tpu"
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

_HI = jax.lax.Precision.HIGHEST
M, W, L = 256, 256, 128

rng = np.random.default_rng(0)
table = rng.normal(size=(W, L)).astype(np.float32)
idx = rng.integers(0, W, size=M).astype(np.int32)
a = rng.normal(size=(M, L)).astype(np.float32)
b = rng.normal(size=(M, L)).astype(np.float32)
c = rng.normal(size=(M, L)).astype(np.float32)
d = rng.normal(size=(M, L)).astype(np.float32)


def split3(x):
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def probe_a():
    def kern(idx_ref, tab_ref, out_ref):
        onehot = (idx_ref[:, 0][:, None] == lax.broadcasted_iota(
            jnp.int32, (M, W), 1)).astype(jnp.bfloat16)
        sel = jnp.dot(onehot, tab_ref[:],
                      preferred_element_type=jnp.float32)
        out_ref[:] = sel[:, :L] + sel[:, L:2 * L] + sel[:, 2 * L:]

    @jax.jit
    def run(table, idxj):
        hi, mid, lo = split3(table)
        tab = jnp.concatenate([hi, mid, lo], axis=1)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
            interpret=_INTERP,
        )(idxj[:, None], tab)

    out = np.asarray(run(jnp.asarray(table), jnp.asarray(idx)))
    want = table[idx]
    err = np.max(np.abs(out - want)) / np.max(np.abs(want))
    print(f"A bf16-3split select: rel err {err:.3e}", flush=True)


def probe_b():
    def kern(idx_ref, tab_ref, out_ref):
        onehot = (idx_ref[:, 0][:, None] == lax.broadcasted_iota(
            jnp.int32, (M, W), 1)).astype(jnp.float32)
        out_ref[:] = jnp.dot(onehot, tab_ref[:],
                             preferred_element_type=jnp.float32,
                             precision=_HI)

    @jax.jit
    def run(table, idxj):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
            interpret=_INTERP,
        )(idxj[:, None], table)

    out = np.asarray(run(jnp.asarray(table), jnp.asarray(idx)))
    want = table[idx]
    err = np.max(np.abs(out - want)) / np.max(np.abs(want))
    print(f"B f32-HI select:      rel err {err:.3e}", flush=True)


def probe_c():
    dn = (((0,), (0,)), ((), ()))

    def kern_stacked(a_ref, b_ref, c_ref, d_ref, out_ref):
        av = jnp.concatenate([a_ref[:], b_ref[:]], axis=1)
        bu = jnp.concatenate([c_ref[:], d_ref[:]], axis=1)
        out_ref[:] = lax.dot_general(av, bu, dn,
                                     preferred_element_type=jnp.float32,
                                     precision=_HI)

    def kern_sep(a_ref, b_ref, c_ref, d_ref, out_ref):
        for (i, x) in enumerate((a_ref, b_ref)):
            for (j, y) in enumerate((c_ref, d_ref)):
                out_ref[i * L:(i + 1) * L, j * L:(j + 1) * L] = (
                    lax.dot_general(x[:], y[:], dn,
                                    preferred_element_type=jnp.float32,
                                    precision=_HI))

    want = np.block(
        [[a.T.astype(np.float64) @ c.astype(np.float64),
          a.T.astype(np.float64) @ d.astype(np.float64)],
         [b.T.astype(np.float64) @ c.astype(np.float64),
          b.T.astype(np.float64) @ d.astype(np.float64)]])
    for name, kern in (("stacked", kern_stacked), ("separate", kern_sep)):
        @jax.jit
        def run(a, b, c, d, kern=kern):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((2 * L, 2 * L), jnp.float32),
                interpret=_INTERP,
            )(a, b, c, d)

        out = np.asarray(run(*map(jnp.asarray, (a, b, c, d))))
        err = np.max(np.abs(out - want)) / np.max(np.abs(want))
        print(f"C {name:8s} band dot: rel err {err:.3e}", flush=True)


if __name__ == "__main__":
    probe_a()
    probe_b()
    probe_c()
