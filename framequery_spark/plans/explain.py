"""Physical-plan inspection helpers.

The engine deliberately has no optimizer of its own (SURVEY §4.1: every
reference rewrite is subsumed by Catalyst); these helpers make that claim
testable — they assert that the plans Catalyst produces for our compiled
queries have the properties we rely on at 100 TB: filter/column pushdown to
the parquet scan, broadcast joins for small dimensions, partial aggregation,
and whole-stage codegen coverage.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the parquet scan carries PushedFilters mentioning every
    fragment (column name, usually)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.replace(" ", ""):
            if all(f in line for f in fragments) or not fragments:
                return True
    return False


def scan_read_schema(df: DataFrame) -> list:
    """Column names in the first scan's ReadSchema (column-pruning check)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [c.split(":")[0].strip() for c in inner.split(",") if c]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or \
        "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Catalyst splits groupBy into partial + final HashAggregate."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial_" in plan


def codegen_stage_count(df: DataFrame) -> int:
    """Count codegen'd operators: explain('formatted') marks them with '* '
    (only meaningful with AQE disabled — AdaptiveSparkPlan hides markers
    until execution)."""
    import re

    plan = formatted_plan(df)
    tree = plan.split("\n\n", 1)[0]
    return len(re.findall(r"\*\s+\w", tree))
