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
- unpersisting a PERSIST is always safe — a later re-materialization of a
  released result silently recomputes without the cache. A released
  LOCAL CHECKPOINT (:func:`local_checkpoint_tracked`) is different:
  localCheckpoint truncates lineage, so a checkpointed result read AFTER
  release fails (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) instead of
  recomputing. The discipline is the same — callers release only after
  materializing what they need — but the failure mode is loud, not a
  silent recompute.
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

# Monotone counter of compile-time materializations that leave NO tracked
# handle behind (the recursive-CTE driver-local frontier path collects rows
# into LocalRelations instead of checkpointing). The executor's plan cache
# diffs this counter around a compile exactly like the two registries: a
# plan that embeds materialized rows must never be cached — rebuilding it
# would replay frozen data instead of recomputing from the sources.
COMPILE_MATERIALIZATIONS = 0


def note_compile_materialization() -> None:
    global COMPILE_MATERIALIZATIONS
    COMPILE_MATERIALIZATIONS += 1


# RDD ids persisted by local_checkpoint_tracked: localCheckpoint persists
# its materialized RDD OUTSIDE the DataFrame cache registry (neither
# df.unpersist() nor catalog.clearCache() drops it), so without explicit
# tracking every checkpointing operator call leaks one persisted RDD until
# the driver GC happens to collect the handle — bench.py's per-rep
# cache_diag measured exactly that (+1 persistent RDD per rep for the
# MMR / connected-components entries). Entries are (SparkContext, rdd_id).
_TRACKED_CKPT: List[tuple] = []


def local_checkpoint_tracked(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` + registration of the persisted RDD
    for :func:`release_cached`. The returned DataFrame must not be read
    again after release (checkpoint blocks are gone — callers hold
    checkpoints only within an operator invocation, and release happens
    between invocations). Id discovery diffs the persistent-RDD map
    around the checkpoint call; safe for the library's single-threaded
    operator construction."""
    sc = df.sparkSession.sparkContext
    try:
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    except Exception:  # pragma: no cover — py4j unavailable shapes
        return df.localCheckpoint(eager)
    out = df.localCheckpoint(eager)
    try:
        after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        for rid in after - before:
            _TRACKED_CKPT.append((sc, rid))
    except Exception:  # pragma: no cover
        pass
    return out


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


def release_cached(blocking: bool = False,
                   checkpoints: bool = True) -> int:
    """Unpersist every tracked intermediate; returns the number released.
    Idempotent; safe to call while results are still lazy (they recompute
    uncached). Default is non-blocking (fire-and-forget block removal);
    pass ``blocking=True`` when the next measurement must not overlap the
    async removal — back-to-back bench reps with non-blocking release can
    accumulate cached blocks faster than the async cleaner drops them,
    which reads as monotonically rising rep times.

    ``checkpoints=False`` releases only the plain persists and leaves
    tracked localCheckpoints for the ContextCleaner — a released
    checkpoint FAILS on re-read (lineage truncated) instead of
    recomputing, so auto-release hooks that fire between operator calls
    (the ``__spark_entry__`` wrappers) opt out to preserve the
    every-result-stays-readable invariant; explicit callers that have
    materialized everything (bench reps, tests, session teardown) keep
    the full default."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:  # session already stopped — nothing to release
            pass
    while checkpoints and _TRACKED_CKPT:
        sc, rid = _TRACKED_CKPT.pop()
        try:
            jmap = sc._jsc.getPersistentRDDs()
            if jmap.containsKey(rid):
                jmap.get(rid).unpersist(blocking)
                released += 1
        except Exception:  # session already stopped
            pass
    return released
