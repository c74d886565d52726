"""Pivot / unpivot between STACKED and PIVOTED value formats.

Reference dsgrid/spark/functions.py:522-575 + NULL expected-missing
handling in dsgrid/utils/dataset.py:761-780.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.common import VALUE_COLUMN


def pivot(df: DataFrame, pivot_column: str, value_column: str = VALUE_COLUMN,
          pivot_values: list[str] | None = None,
          agg_function: str = "sum") -> DataFrame:
    """Stacked → pivoted: one value column per record of ``pivot_column``.

    Passing ``pivot_values`` explicitly skips the extra distinct-scan Spark
    otherwise runs to discover pivot values — always pass it when the
    dimension records are known (they always are in a registered project).
    """
    ids = [c for c in df.columns if c not in (pivot_column, value_column)]
    gb = df.groupBy(*ids)
    p = gb.pivot(pivot_column, pivot_values) if pivot_values else gb.pivot(pivot_column)
    return p.agg(getattr(F, agg_function)(value_column).alias(value_column))


def unpivot(df: DataFrame, value_columns: list[str],
            variable_column: str, value_column: str = VALUE_COLUMN,
            drop_nulls: bool = False) -> DataFrame:
    """Pivoted → stacked (melt).

    NULLs in pivoted cells mark *expected-missing* dimension associations
    (reference dsgrid/utils/dataset.py:761-780): by default they are kept
    as explicit NULL-value rows so downstream consistency checks can see
    them; pass ``drop_nulls=True`` to discard.
    """
    ids = [c for c in df.columns if c not in value_columns]
    out = df.unpivot(ids, value_columns, variable_column, value_column)
    if drop_nulls:
        out = out.filter(F.col(value_column).isNotNull())
    return out
