"""User lateral table functions: per-row table-function invocation.

The reference iterates rows on the driver
(src/framequery/executor/_pandas.py:292-319 — iterrows; the scale
anti-pattern). Here the user function runs inside a Python UDTF on the
executors, joined with Spark 4's native DataFrame.lateralJoin: parent
columns are replicated onto child rows exactly like the reference's concat,
but distributed, and the lateral's alias qualifies its produced columns
(reference prefixes lateral children `alias/@/col`).
"""

from __future__ import annotations

from typing import Callable, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_lateral_udtf(left: DataFrame, func: Callable, schema: T.StructType,
                       arg_cols: List[Column], alias: str) -> DataFrame:
    """For each input row, call func(*arg_values) -> pandas.DataFrame with
    columns matching *schema*; the parent row is replicated onto each child
    row (reference lateral semantics). Columns resolve both bare and
    alias-qualified.

    The correlated arguments are staged as hidden left columns (`.outer()`
    marks single attributes; the arguments may be arbitrary expressions),
    the user function runs inside a Python UDTF on the executors, and the
    combine is Catalyst's LateralJoin — no driver-side loop anywhere."""
    from pyspark.sql.functions import udtf

    child_cols = [f.name for f in schema.fields]

    class _Lateral:
        def eval(self, *args):
            child = func(*args)
            if child is None or len(child) == 0:
                return
            for t in child[child_cols].itertuples(index=False):
                yield tuple(t)

    gen = udtf(_Lateral, returnType=schema)

    n_args = len(arg_cols)
    tmp_names = [f"__larg{i}" for i in range(n_args)]
    staged = left.select("*", *[c.alias(n) for c, n in zip(arg_cols, tmp_names)])
    right = gen(*[F.col(n).outer() for n in tmp_names]).alias(alias)
    return staged.lateralJoin(right).drop(*tmp_names)
