"""Device mesh construction for the imaging workload.

Axes:

- ``chan``: frequency channels — the primary data-parallel axis (zero
  steady-state communication; place on DCN for multi-host);
- ``vis``: visibility buckets within a channel — reduction-heavy (psum of
  grids); place on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(devices: Optional[Sequence] = None, vis_shards: int = 1) -> Mesh:
    """Build a ("chan", "vis") mesh over the given (or all) devices.

    ``vis_shards`` devices cooperate on each channel; the rest of the
    devices spread over channels.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % vis_shards != 0:
        raise ValueError(f"{n} devices not divisible by vis_shards={vis_shards}")
    arr = np.asarray(devices).reshape(n // vis_shards, vis_shards)
    return Mesh(arr, axis_names=("chan", "vis"))
