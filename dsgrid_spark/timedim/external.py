"""DATETIME_EXTERNAL_TZ and aligned-in-clock-time handling.

Reference dsgrid/config/dimensions.py:746-790
(DatetimeExternalTimeZoneDimensionModel): timestamps are tz-NAIVE and
mean local wall-clock time in each row's geography; localizing them
through the geography's IANA zone yields absolute time. The same
operation implements TimeZoneFormat.ALIGNED_IN_CLOCK_TIME
(dsgrid/dimension/time.py:30, dimensions.py:461-478): per-geography data
shares clock-time timestamps which must be shifted into absolute time
before datasets in different zones can be combined.

Spark-first: ``to_utc_timestamp(ts, tz_column)`` takes a per-ROW zone
expression, so the whole conversion is one codegen'd column — no UDF, no
per-zone union. The geography→tz attach is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.operators.mapping import add_column_from_records


def localize_external_tz(
    df: DataFrame,
    time_column: str = "timestamp",
    time_zone: str | None = None,
    geography_records: DataFrame | None = None,
    geography_column: str = "geography",
    tz_column: str = "time_zone",
) -> DataFrame:
    """Naive local wall-clock → absolute time (UTC instant).

    Single-zone form (``time_zone=...``) covers
    AlignedTimeSingleTimeZone with naive stamps; the per-geography form
    joins ``time_zone`` from geography records and localizes per row
    (LocalTimeMultipleTimeZones / DATETIME_EXTERNAL_TZ).
    """
    if (time_zone is None) == (geography_records is None):
        raise ValueError("pass exactly one of time_zone / geography_records")
    if time_zone is not None:
        return df.withColumn(
            time_column, F.to_utc_timestamp(F.col(time_column), time_zone)
        )
    out = add_column_from_records(
        df, geography_records, geography_column, records_value=tz_column,
        new_column="__tz",
    )
    return out.withColumn(
        time_column, F.to_utc_timestamp(F.col(time_column), F.col("__tz"))
    ).drop("__tz")


def align_to_clock_time(
    df: DataFrame,
    time_column: str = "timestamp",
    geography_records: DataFrame | None = None,
    geography_column: str = "geography",
    time_zone: str | None = None,
    tz_column: str = "time_zone",
) -> DataFrame:
    """Inverse: absolute time → local wall-clock per geography (or one
    zone). After this, rows in different zones with equal timestamps are
    aligned in CLOCK time — the resampling target the reference calls
    aligned_in_clock_time."""
    if (time_zone is None) == (geography_records is None):
        raise ValueError("pass exactly one of time_zone / geography_records")
    if time_zone is not None:
        return df.withColumn(
            time_column, F.from_utc_timestamp(F.col(time_column), time_zone)
        )
    out = add_column_from_records(
        df, geography_records, geography_column, records_value=tz_column,
        new_column="__tz",
    )
    return out.withColumn(
        time_column, F.from_utc_timestamp(F.col(time_column), F.col("__tz"))
    ).drop("__tz")
