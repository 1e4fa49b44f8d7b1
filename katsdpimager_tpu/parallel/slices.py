"""Unrollable scan over the (static, small) W-slice axis.

The round-4 device profile put ~23% of the production step in scan/cond
plumbing (doc/PERFORMANCE.md, round-4 trace table).  The W-slice count is
a static property of the batch geometry and small (the reference's
w-slice search returns ~4 for real max-w, parameters.py), so the slice
loops unroll into straight-line HLO by default — XLA then overlaps and
fuses across slice bodies and drops the per-iteration gather/carry
machinery.  ``KTPU_UNROLL_SLICES=0`` restores ``lax.scan`` (useful when
compile time matters more than step time, e.g. very large S).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def scan_slices(body, init, xs):
    """``lax.scan(body, init, xs)`` with default Python unrolling.

    Same contract as ``lax.scan`` for tuple-of-arrays ``xs`` with equal
    leading (slice) axes; ``body`` returns ``(carry, y)`` where ``y`` may
    be None (pure carry) or an array pytree (stacked on return).
    """
    if os.environ.get("KTPU_UNROLL_SLICES", "1") != "1":
        return jax.lax.scan(body, init, xs)
    leaves = jax.tree_util.tree_leaves(xs)
    num = leaves[0].shape[0]
    carry = init
    ys = []
    for s in range(num):
        carry, y = body(carry, jax.tree_util.tree_map(lambda a: a[s], xs))
        ys.append(y)
    if not ys or ys[0] is None:
        return carry, None
    stacked = jax.tree_util.tree_map(lambda *vs: jnp.stack(vs), *ys)
    return carry, stacked
