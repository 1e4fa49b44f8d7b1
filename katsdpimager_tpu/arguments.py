"""Argument round-tripping for provenance (parity with reference
``arguments.py``): track which options differ from their defaults and
reconstruct a canonical command line for FITS HISTORY headers."""

from __future__ import annotations

import argparse
from typing import Iterable, List


class SmartNamespace(argparse.Namespace):
    """Namespace that records which attributes were explicitly set more than
    once (i.e. by the parser after defaults)."""

    def __init__(self, **kwargs):
        self.__dict__["_set_count"] = {}
        super().__init__(**kwargs)

    def __setattr__(self, name, value):
        counts = self.__dict__.setdefault("_set_count", {})
        counts[name] = counts.get(name, 0) + 1
        super().__setattr__(name, value)

    def changed(self, name) -> bool:
        return self.__dict__["_set_count"].get(name, 0) > 1


def _format_value(value) -> List[str]:
    if isinstance(value, bool):
        return []
    if isinstance(value, (list, tuple)):
        return [",".join(str(v) for v in value)]
    return [str(value)]


def unparse_args(args: SmartNamespace, exclude: Iterable[str] = (),
                 arg_handlers=None) -> List[str]:
    """Reconstruct command-line arguments for options changed from default."""
    arg_handlers = arg_handlers or {}
    exclude = set(exclude)
    out: List[str] = []
    for name in sorted(vars(args)):
        if name.startswith("_") or name in exclude:
            continue
        if not args.changed(name):
            continue
        value = getattr(args, name)
        flag = "--" + name.replace("_", "-")
        if name in arg_handlers:
            out.extend(arg_handlers[name](name, value))
        elif isinstance(value, bool):
            out.append(flag if value else "--no-" + name.replace("_", "-"))
        elif value is not None:
            formatted = _format_value(value)
            out.append(flag + "=" + formatted[0] if formatted else flag)
    return out
