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


def flag_outliers(df: DataFrame, group_by: list[str],
                  value_column: str = VALUE_COLUMN,
                  z: float = 3.0,
                  broadcast_stats: bool | None = None) -> DataFrame:
    """Attach per-group z-score columns and an ``is_outlier`` flag
    (|value − μ| > z·σ, sample stddev) — the data-quality anomaly scan
    run over a fact table before it enters an aggregation.

    Two-phase: a partial-agg groupBy computes (μ, σ) per group (the
    shuffle carries one row per group), then the stats join back onto the
    facts. ``broadcast_stats`` (ADVICE r4): True forces the broadcast
    hint (groups ≪ rows, the common case — the fact table never
    shuffles); False leaves the strategy to Catalyst/AQE, which measures
    the stats table's actual size at runtime — the safe setting when
    ``group_by`` is high-cardinality and a forced broadcast could OOM.
    Default ``None`` = let AQE decide: with one row per group the stats
    relation is almost always under the adaptive broadcast threshold, so
    AQE picks the broadcast join anyway, without the unbounded hint.
    """
    stats = df.groupBy(*group_by).agg(
        F.avg(value_column).alias("__mu"),
        F.stddev_samp(value_column).alias("__sigma"),
    )
    out = df.join(F.broadcast(stats) if broadcast_stats else stats, group_by)
    flag = (F.col("__sigma").isNotNull()
            & (F.abs(F.col(value_column) - F.col("__mu"))
               > F.lit(z) * F.col("__sigma")))
    return out.withColumn("is_outlier", flag).drop("__mu", "__sigma")


def count_outliers(df: DataFrame, group_by: list[str],
                   value_column: str = VALUE_COLUMN,
                   z: float = 3.0) -> DataFrame:
    """Per-group outlier counts from :func:`flag_outliers`."""
    return (
        flag_outliers(df, group_by, value_column, z)
        .groupBy(*group_by)
        .agg(F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"))
    )
