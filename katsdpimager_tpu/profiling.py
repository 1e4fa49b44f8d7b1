"""Host-side frame-stack profiler plus JAX device-trace integration.

Parity with the reference ``profiling.py``: an interned frame tree,
stopwatches via contextvars, ``@profile_function`` decorators, a pluggable
profiler (Null / Flamegraph / Collect), and flamegraph.pl-format output.
Device-side tracing maps to ``jax.named_scope`` (visible in XProf traces)
instead of CUDA events/NVTX.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
import time
from typing import Dict, List, Optional, Tuple

import jax

_current_stack: contextvars.ContextVar[Tuple[str, ...]] = contextvars.ContextVar(
    "katsdpimager_tpu_profile_stack", default=())


class Record:
    __slots__ = ("stack", "elapsed")

    def __init__(self, stack: Tuple[str, ...], elapsed: float):
        self.stack = stack
        self.elapsed = elapsed


class Profiler:
    """Base profiler: does nothing (NullProfiler semantics)."""

    _instance: "Profiler" = None  # set below

    @classmethod
    def set_profiler(cls, profiler: "Profiler"):
        cls._instance = profiler

    @classmethod
    def get_profiler(cls) -> "Profiler":
        return cls._instance

    def record(self, record: Record):
        pass


class CollectProfiler(Profiler):
    """Collects every record (for tests)."""

    def __init__(self):
        self.records: List[Record] = []

    def record(self, record: Record):
        self.records.append(record)


class FlamegraphProfiler(Profiler):
    """Aggregates exclusive time per stack for flamegraph.pl."""

    def __init__(self):
        self.inclusive: Dict[Tuple[str, ...], float] = {}

    def record(self, record: Record):
        self.inclusive[record.stack] = (
            self.inclusive.get(record.stack, 0.0) + record.elapsed)

    def exclusive(self) -> Dict[Tuple[str, ...], float]:
        out = dict(self.inclusive)
        for stack, elapsed in self.inclusive.items():
            if len(stack) > 1:
                parent = stack[:-1]
                if parent in out:
                    out[parent] -= elapsed
        return out

    def write_flamegraph(self, f):
        for stack, elapsed in sorted(self.exclusive().items()):
            if elapsed > 0:
                f.write(";".join(stack) + f" {int(elapsed * 1e6)}\n")


Profiler._instance = Profiler()


@contextlib.contextmanager
def profile(name: str):
    """Stopwatch context: times the block, tags device work with a JAX
    named_scope, and reports to the active profiler."""
    stack = _current_stack.get() + (name,)
    token = _current_stack.set(stack)
    start = time.monotonic()
    try:
        with jax.named_scope(name):
            yield
    finally:
        elapsed = time.monotonic() - start
        _current_stack.reset(token)
        Profiler.get_profiler().record(Record(stack, elapsed))


def profile_function(name: Optional[str] = None):
    """Decorator applying :func:`profile` around a function call."""

    def decorator(fn):
        label = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with profile(label):
                return fn(*args, **kwargs)

        return wrapper

    return decorator


def device_trace(log_dir: str):
    """Start a JAX profiler trace (view with TensorBoard/XProf); the
    TPU-native replacement for the reference's NVTX/nsight ranges."""
    return jax.profiler.trace(log_dir)


def parse_device_profile(log_dir: str) -> Dict[Tuple[str, str], float]:
    """Aggregate per-op device time from a captured XProf trace.

    Reads the ``.xplane.pb`` files under ``log_dir`` (written by
    :func:`device_trace` / ``jax.profiler.trace``) and returns
    {(line_name, op_name): total_seconds} for every event on a device
    plane.  This is the TPU-native analogue of the reference's
    device-event records (``profiling.py:133-149``): XLA op names carry
    the ``jax.named_scope`` prefixes that :func:`profile` installs, so
    the aggregation groups naturally by pipeline stage.

    Falls back to host-side XLA executor lines when no accelerator plane
    exists (CPU test runs).
    """
    import glob
    import os

    from jax.profiler import ProfileData

    totals: Dict[Tuple[str, str], float] = {}
    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                             recursive=True))
    for path in files:
        pd = ProfileData.from_file(path)
        planes = list(pd.planes)
        device_planes = [p for p in planes
                         if "TPU" in p.name or "GPU" in p.name
                         or "/device:" in p.name]
        if not device_planes:
            # CPU fallback: PjRt client execution lines carry op timings
            device_planes = [p for p in planes if p.name == "/host:CPU"]
            line_filter = lambda name: ("PjRt" in name     # noqa: E731
                                        or "xla" in name.lower())
        else:
            line_filter = lambda name: True                # noqa: E731
        for plane in device_planes:
            for line in plane.lines:
                if not line_filter(line.name):
                    continue
                for ev in line.events:
                    dur = ev.duration_ns
                    if not dur:
                        continue
                    name = ev.name
                    if name.startswith(("ThreadpoolListener", "end:")):
                        continue
                    key = (line.name, name)
                    totals[key] = totals.get(key, 0.0) + dur * 1e-9
    return totals


def write_device_profile(totals: Dict[Tuple[str, str], float], f) -> None:
    """Write aggregated device times in flamegraph.pl format
    (``line;op microseconds``), largest first — the analogue of the
    reference's ``--write-device-profile`` output
    (``scripts/imager.py:89-92``)."""
    for (line, op), secs in sorted(totals.items(), key=lambda kv: -kv[1]):
        us = int(secs * 1e6)
        if us > 0:
            f.write(f"{line};{op} {us}\n")
