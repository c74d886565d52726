"""Set operations with column checking.

Reference dsgrid/spark/functions.py:156-205 (exceptAll / intersect),
dsgrid/utils/spark.py:911-920 (checked union),
dataset_schema_handler_two_table.py:266-290 (symmetric diff for id checks).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_checked(dfs: list[DataFrame]) -> DataFrame:
    """Union by NAME (order-insensitive), requiring identical column sets."""
    if not dfs:
        raise ValueError("no dataframes to union")
    first = set(dfs[0].columns)
    for df in dfs[1:]:
        if set(df.columns) != first:
            raise ValueError(f"column mismatch: {sorted(first)} vs {sorted(df.columns)}")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def symmetric_difference(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """(df1 ∖ df2) ∪ (df2 ∖ df1), distinct — id-consistency diagnostics.

    Not the reference's union/exceptAll construction
    (two_table :276): with bag semantics that leaves one copy of every
    COMMON row too; subtract-based form returns exactly the rows present
    in one side only.
    """
    return df1.subtract(df2).unionAll(df2.subtract(df1))
