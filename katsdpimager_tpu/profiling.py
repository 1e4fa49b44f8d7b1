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
