"""Tracked persistence for multi-consumer operator intermediates.

Several operators persist an intermediate that feeds multiple plan branches
(shingle/gram streams, MinHash signatures): without the persist the
expensive stream recomputes once per consumer. Because operators return
*lazy* DataFrames, the persist cannot be released inside the operator — the
caller has not materialized anything yet — so a bare ``.persist()`` would
leak cached partitions for the session lifetime in a long-lived
:class:`~framequery_spark.executor.executor.Executor` that runs dedup ops
repeatedly.

This module is the discipline: operators call :func:`persist_tracked`
instead of ``.persist()``, and

- callers that materialized the result release everything with
  :func:`release_cached` (tests and ``bench.py`` do this per entry);
- every ``__spark_entry__`` op callable releases the *previous* op's
  leftovers on invocation, so repeated op calls hold at most one op's
  working set;
- unpersisting is always safe — a later re-materialization of a released
  result silently recomputes without the cache.
"""
from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

try:
    from pyspark import StorageLevel
    _DEFAULT_LEVEL = StorageLevel.MEMORY_AND_DISK
except Exception:  # pragma: no cover
    _DEFAULT_LEVEL = None

# strong refs on purpose: the JVM-side cache exists regardless of whether
# the Python handle stays reachable, so the registry must keep the handle
# alive until release_cached() can unpersist it. The handles themselves are
# tiny (plan pointers, no data).
_TRACKED: List[DataFrame] = []


def persist_tracked(df: DataFrame, level=None) -> DataFrame:
    """``df.persist(level)`` + registration for later :func:`release_cached`."""
    df = df.persist(level if level is not None else _DEFAULT_LEVEL)
    _TRACKED.append(df)
    return df


def release_one(df: DataFrame) -> None:
    """Unpersist one tracked intermediate and drop it from the registry —
    for operators that own a persist with a bounded lifetime (a training
    loop) while the caller may hold OTHER tracked persists that must
    survive (release_cached would drop those too)."""
    try:
        df.unpersist(False)
    except Exception:  # pragma: no cover — session already stopped
        pass
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass


def release_cached(blocking: bool = False) -> int:
    """Unpersist every tracked intermediate; returns the number released.
    Idempotent; safe to call while results are still lazy (they recompute
    uncached). Default is non-blocking (fire-and-forget block removal);
    pass ``blocking=True`` when the next measurement must not overlap the
    async removal — back-to-back bench reps with non-blocking release can
    accumulate cached blocks faster than the async cleaner drops them,
    which reads as monotonically rising rep times."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return released
