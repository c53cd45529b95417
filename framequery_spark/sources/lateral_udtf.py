"""User lateral table functions: per-row table-function invocation.

The reference iterates rows on the driver
(src/framequery/executor/_pandas.py:292-319 — iterrows; the scale
anti-pattern). Here the user function runs inside `mapInPandas`, Arrow-batched
per partition: parent columns are broadcast onto child rows exactly like the
reference's concat, but distributed.
"""

from __future__ import annotations

from typing import Callable, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_lateral_udtf(left: DataFrame, func: Callable, schema: T.StructType,
                       arg_cols: List[Column], alias: str) -> DataFrame:
    """For each input row, call func(*arg_values) -> pandas.DataFrame with
    columns matching *schema*; the parent row is replicated onto each child
    row (reference lateral semantics)."""
    n_args = len(arg_cols)
    tmp_names = [f"__larg{i}" for i in range(n_args)]
    staged = left.select("*", *[c.alias(n) for c, n in zip(arg_cols, tmp_names)])

    out_schema = T.StructType(
        [f for f in staged.schema.fields if not f.name.startswith("__larg")]
        + list(schema.fields)
    )
    parent_cols = [f.name for f in staged.schema.fields
                   if not f.name.startswith("__larg")]
    child_cols = [f.name for f in schema.fields]

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                child = func(*[row[n] for n in tmp_names])
                if child is None or len(child) == 0:
                    continue
                child = child[child_cols].reset_index(drop=True)
                parent = pd.DataFrame(
                    {c: [row[c]] * len(child) for c in parent_cols})
                rows.append(pd.concat([parent, child], axis=1))
            if rows:
                yield pd.concat(rows, ignore_index=True)
            else:
                yield pd.DataFrame({f.name: pd.Series(dtype="object")
                                    for f in out_schema.fields})

    return staged.mapInPandas(gen, schema=out_schema)
