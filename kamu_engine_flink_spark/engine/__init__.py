"""Engine entry points.

Lazy attribute access instead of eager submodule imports: operators/base.py
needs engine.state, and an eager `from .transform import ...` here would
close an import cycle (transform -> operators -> base -> engine package).
"""

from __future__ import annotations

__all__ = ["execute_raw_query", "execute_transform"]


def __getattr__(name: str):
    if name == "execute_raw_query":
        from .raw_query import execute_raw_query

        return execute_raw_query
    if name == "execute_transform":
        from .transform import execute_transform

        return execute_transform
    raise AttributeError(name)
