"""Error surface.

The reference exposes a single ``FlacoException`` wrapping connect /
query / IO failures (``/root/reference/src/lib.rs:16,35-38``; tests
``tests/test_general.py:103-112``).  We mirror that with one
``EngineError`` that wraps whatever Spark / connector exception
occurred, keeping the original as ``__cause__``.
"""

from __future__ import annotations


class EngineError(Exception):
    """Single public exception type (flaco-parity: ``FlacoException``)."""

    @classmethod
    def wrap(cls, exc: BaseException, context: str = "") -> "EngineError":
        msg = f"{context}: {exc}" if context else str(exc)
        err = cls(msg)
        err.__cause__ = exc
        return err
