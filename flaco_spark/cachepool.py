"""Shared pool of live operator caches.

Pair-finding and iterative builders persist intermediates that must
outlive the builder call (the harness's terminal action happens
later), so each builder RELEASES ITS PREDECESSORS' caches on entry and
registers its own here; callers composing builders manually can call
:func:`release_caches` after their terminal action.  Builders run
sequentially under the harness (each query's action completes before
the next builder runs), which is what makes the release-on-entry
protocol safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Track a persisted DataFrame for later release."""
    if df is not None:
        _LIVE_CACHES.append(df)
    return df


def release_caches() -> None:
    """Unpersist every cache registered so far."""
    while _LIVE_CACHES:
        try:
            _LIVE_CACHES.pop().unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
