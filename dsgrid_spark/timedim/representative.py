"""Representative-period time → datetime.

Reference dsgrid/config/representative_period_time_dimension_config.py
:20-100 and dsgrid/dimension/time.py:34-50: a dataset keyed by a period
template — ``(month, day_of_week, hour)`` (ONE_WEEK_PER_MONTH_BY_HOUR) or
``(month, is_weekday, hour)`` — is joined to every matching real timestamp
of the target year, in each geography's LOCAL time zone.

Spark-first plan: build the target-year hourly calendar ONCE (tiny: 8760
rows), cross it with the distinct time zones (handful), derive the
template keys with from_utc_timestamp month/dayofweek/hour — then a single
inner join template→calendar. The big fact table is joined against a
small broadcast calendar; it never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.dimensions import RepresentativePeriodFormat
from dsgrid_spark.operators.mapping import add_column_from_records
from dsgrid_spark.timedim.calendar import hourly_calendar_for_year

_FORMAT_COLUMNS = {
    RepresentativePeriodFormat.ONE_WEEK_PER_MONTH_BY_HOUR: [
        "month", "day_of_week", "hour"
    ],
    RepresentativePeriodFormat.ONE_WEEKDAY_DAY_AND_ONE_WEEKEND_DAY_PER_MONTH_BY_HOUR: [
        "month", "is_weekday", "hour"
    ],
}


def representative_to_datetime(
    df: DataFrame,
    geography_records: DataFrame,
    year: int,
    fmt: RepresentativePeriodFormat = RepresentativePeriodFormat.ONE_WEEK_PER_MONTH_BY_HOUR,
    geography_column: str = "geography",
    time_column: str = "timestamp",
) -> DataFrame:
    """Join the period template to all matching real timestamps.

    Output carries tz-aware timestamps (the local wall time of each zone
    rendered back to the session zone) for every hour of ``year``.
    """
    keys = _FORMAT_COLUMNS[fmt]
    spark = df.sparkSession

    cal = hourly_calendar_for_year(spark, year, time_column)
    zones = geography_records.select(
        F.col("time_zone").alias("__tz")
    ).distinct()
    cal = cal.crossJoin(F.broadcast(zones))
    # local wall-clock fields per zone; calendar timestamps are naive UTC
    local = F.from_utc_timestamp(F.col(time_column), F.col("__tz"))
    cal = cal.withColumn("month", F.month(local)).withColumn("hour", F.hour(local))
    if fmt == RepresentativePeriodFormat.ONE_WEEK_PER_MONTH_BY_HOUR:
        # reference convention: Monday=0..Sunday=6; Spark dayofweek: Sunday=1
        cal = cal.withColumn("day_of_week", (F.dayofweek(local) + 5) % 7)
    else:
        cal = cal.withColumn(
            "is_weekday", ((F.dayofweek(local) + 5) % 7 < 5)
        )

    fact = add_column_from_records(df, geography_records, geography_column)
    join_cond = [fact["time_zone"] == cal["__tz"]] + [
        fact[k] == cal[k] for k in keys
    ]
    out = fact.join(F.broadcast(cal), join_cond, "inner")
    drop = ["__tz", "time_zone"] + keys
    # drop both sides' template cols (cal's copies are auto-suffixed away by drop-by-Column)
    for k in keys:
        out = out.drop(cal[k])
    return out.drop(*drop)
