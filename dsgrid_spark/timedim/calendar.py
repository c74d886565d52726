"""Calendar DataFrames via F.sequence + explode — no driver-side loops.

A calendar DF is the expected timestamp set of a time-dimension config
(reference builds these ranges in chronify / dataset_schema_handler_base
:323-452). Generated entirely JVM-side: a one-row DataFrame with
``sequence(start, end, interval)`` exploded — scales to any range without
moving data through the driver.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession, functions as F


def datetime_calendar(
    spark: SparkSession,
    start: datetime | str,
    end: datetime | str,
    interval_seconds: int,
    column: str = "timestamp",
) -> DataFrame:
    """All timestamps in [start, end] at a fixed resolution."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(str(start)).cast("timestamp"),
                    F.lit(str(end)).cast("timestamp"),
                    F.expr(f"INTERVAL {int(interval_seconds)} SECONDS"),
                )
            ).alias(column)
        )
    )


def hourly_calendar_for_year(spark: SparkSession, year: int,
                             column: str = "timestamp") -> DataFrame:
    """8760/8784 hourly timestamps of one calendar year."""
    return datetime_calendar(
        spark, f"{year}-01-01 00:00:00", f"{year}-12-31 23:00:00", 3600, column
    )


def annual_calendar(spark: SparkSession, years: list[int],
                    column: str = "year") -> DataFrame:
    return spark.createDataFrame([(y,) for y in years], f"{column} int")


def check_time_consistency(
    df: DataFrame,
    calendar: DataFrame,
    time_column: str = "timestamp",
    value_column: str = "value",
) -> None:
    """Every dimension combination must have the identical, complete
    timestamp set defined by the config ranges.

    Reference dataset_schema_handler_base.py:323-452. Implemented as two
    aggregate checks (counts + anti-join), all distributed:
    1. the distinct timestamps in the data equal the calendar set;
    2. every dim-combo has exactly ``len(calendar)`` rows.
    """
    n_expected = calendar.count()
    extra = (
        df.select(time_column).distinct()
        .join(calendar.withColumnRenamed(calendar.columns[0], time_column),
              [time_column], "left_anti")
        .limit(1).count()
    )
    if extra:
        raise ValueError("data contains timestamps outside the configured range")
    dim_cols = [c for c in df.columns if c not in (time_column, value_column)]
    if dim_cols:
        bad = (
            df.groupBy(*dim_cols)
            .agg(F.count_distinct(time_column).alias("__n"))
            .filter(F.col("__n") != n_expected)
            .limit(1).count()
        )
    else:
        bad = int(df.select(time_column).distinct().count() != n_expected)
    if bad:
        raise ValueError(
            f"incomplete time range: some dimension combination lacks all "
            f"{n_expected} expected timestamps"
        )
