"""JVM-native small local relations.

``spark.createDataFrame(rows)`` backs the DataFrame with a Python
``parallelize`` RDD split into ``defaultParallelism`` slices: EVERY scan of
the relation then pays one Python-worker round trip per slice (measured on
the bench host: ~1.2-1.6 s per ``take()`` over a 3-row/20-slice relation,
~0.3 s per touched slice), and every plan that embeds the relation re-pays
it on every execution. For the engine's many small driver-known row sets —
``VALUES`` clauses, recursive-CTE driver-local frontiers, model weight
tables — that cost dominates the whole query.

:func:`local_relation` instead converts the rows driver-side to ONE Arrow
batch (the same ``LocalDataToArrowConversion`` path Spark itself uses for
Arrow-typed ``createDataFrame`` input) and hands Spark the ``pyarrow.Table``:
the resulting scan deserializes Arrow in the JVM — no Python workers, ~25 ms
per take on the same host. Values and types are identical by construction
(the converter is Spark's own; the explicit schema pins field types and
nullability). Falls back to plain ``createDataFrame`` for schemas Arrow
cannot carry (CalendarInterval, UDTs) or on any conversion error — the
fallback is always correct, only slower.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _arrow_convertible(dt: T.DataType) -> bool:
    if isinstance(dt, (T.ArrayType,)):
        return _arrow_convertible(dt.elementType)
    if isinstance(dt, T.MapType):
        return _arrow_convertible(dt.keyType) and \
            _arrow_convertible(dt.valueType)
    if isinstance(dt, T.StructType):
        return all(_arrow_convertible(f.dataType) for f in dt.fields)
    # CalendarInterval has no Arrow mapping; UDTs need their own path
    return not isinstance(dt, (T.CalendarIntervalType, T.UserDefinedType))


def local_relation(spark: SparkSession, rows: Sequence,
                   schema) -> DataFrame:
    """A DataFrame over `rows` with exactly `schema`, scanned JVM-side.

    `schema` is a StructType, a DDL string ("a long, b string"), or a list
    of column names (Spark's own inference runs over the rows, exactly as
    ``createDataFrame(rows, names)`` would — same types, Arrow transport)."""
    rows = list(rows)
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    elif isinstance(schema, (list, tuple)):
        # name list → Spark's createDataFrame inference, minus parallelize
        schema = spark._inferSchemaFromList(rows, list(schema))
    if isinstance(schema, T.StructType) and _arrow_convertible(schema):
        try:
            from pyspark.sql.conversion import LocalDataToArrowConversion

            tbl = LocalDataToArrowConversion.convert(
                rows, schema, use_large_var_types=False)
            return spark.createDataFrame(tbl, schema=schema)
        except Exception:
            pass  # fall back to the slow-but-always-correct row path
    return spark.createDataFrame(rows, schema)
