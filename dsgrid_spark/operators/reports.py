"""Reports: peak load (per-group argmax).

Reference dsgrid/query/report_peak_load.py:36-70 computes group-max then
joins back to recover the timestamp rows. The idiomatic Spark form is a
ranking window — one shuffle instead of an agg shuffle plus a join
(SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dsgrid_spark.common import VALUE_COLUMN


def peak_load(df: DataFrame, group_by: list[str],
              value_column: str = VALUE_COLUMN,
              tie_breakers: list[str] | None = None) -> DataFrame:
    """Row(s) holding the per-group maximum value, full row preserved.

    ``tie_breakers`` makes the argmax deterministic when several rows share
    the max (reference keeps all ties via its join-back; we default to the
    same semantics when tie_breakers is None by using rank()).
    """
    order = [F.desc(value_column)] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*group_by).orderBy(*order)
    rank_fn = F.row_number() if tie_breakers else F.rank()
    return (
        df.withColumn("__rk", rank_fn.over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def top_k_per_group(df: DataFrame, group_by: list[str], k: int,
                    value_column: str = VALUE_COLUMN,
                    tie_breakers: list[str] | None = None) -> DataFrame:
    """Top-k rows per group by value (beyond-reference convenience)."""
    order = [F.desc(value_column)] + [F.col(c) for c in (tie_breakers or [])]
    w = Window.partitionBy(*group_by).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
