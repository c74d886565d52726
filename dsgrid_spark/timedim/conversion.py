"""Datetime re-resolution, time-zone conversion, leap/DST adjustment, wrapping.

Reference semantics: dataset_schema_handler_base.py:834-929 (dispatch),
dsgrid/utils/dataset.py:326-611 (chronify glue),
dsgrid/query/query_submitter.py:335-457 (tz conversion),
dsgrid/dimension/time.py:53-188 (leap/DST),
dsgrid/query/models.py:631-635 (wrap_time_allowed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.common import VALUE_COLUMN
from dsgrid_spark.dimensions import (
    DaylightSavingAdjustmentType,
    LeapDayAdjustmentType,
    MeasurementType,
    TimeIntervalType,
)

_DOWNSAMPLE_AGG = {
    MeasurementType.MEAN: F.avg,
    MeasurementType.MIN: F.min,
    MeasurementType.MAX: F.max,
    MeasurementType.TOTAL: F.sum,
    MeasurementType.MEASURED: F.avg,
}


def downsample(
    df: DataFrame,
    time_column: str,
    target_seconds: int,
    measurement_type: MeasurementType = MeasurementType.TOTAL,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Map to a coarser resolution: bucket timestamps, aggregate per
    MeasurementType (TOTAL→sum, MEAN→avg, MIN/MAX→min/max).

    Bucketing uses ``timestamp_seconds(floor(unix/target)*target)`` —
    pure column math, stays in whole-stage codegen.
    """
    bucket = F.timestamp_seconds(
        (F.floor(F.unix_timestamp(F.col(time_column)) / target_seconds)
         * target_seconds).cast("long")
    )
    dim_cols = [c for c in df.columns if c not in (time_column, value_column)]
    agg = _DOWNSAMPLE_AGG[measurement_type]
    return (
        df.withColumn(time_column, bucket)
        .groupBy(time_column, *dim_cols)
        .agg(agg(value_column).alias(value_column))
    )


def rollup_cascade(
    df: DataFrame,
    time_column: str,
    dims: list[str],
    value_column: str = VALUE_COLUMN,
    levels: tuple[str, ...] = ("hour", "day", "month"),
) -> DataFrame:
    """Continuous-aggregate-style multi-resolution rollup: one long
    frame with a ``level`` tag holding the sum (and contributing row
    count) at each ``date_trunc`` resolution.

    Scale shape: the fact table is aggregated ONCE at the finest level;
    every coarser level re-aggregates the previous level's partials, so
    its shuffle carries only ``groups x buckets`` rows. The union's
    branches share the finest-level aggregate subtree, which Spark's
    ReuseExchange dedupes at physical planning (plan-asserted in
    tests) — the raw data is scanned and shuffled exactly once.
    """
    cur = (
        df.groupBy(
            F.date_trunc(levels[0], F.col(time_column)).alias(time_column),
            *dims,
        )
        .agg(
            F.sum(value_column).alias(value_column),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    tagged = [cur.select(F.lit(levels[0]).alias("level"), "*")]
    for lvl in levels[1:]:
        cur = (
            cur.groupBy(
                F.date_trunc(lvl, F.col(time_column)).alias(time_column),
                *dims,
            )
            .agg(
                F.sum(value_column).alias(value_column),
                F.sum("n_rows").alias("n_rows"),
            )
        )
        tagged.append(cur.select(F.lit(lvl).alias("level"), "*"))
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


def upsample(
    df: DataFrame,
    time_column: str,
    source_seconds: int,
    target_seconds: int,
    measurement_type: MeasurementType = MeasurementType.TOTAL,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Map to a finer resolution: explode each interval into its
    sub-timestamps; TOTAL divides the value across steps, others repeat it.

    ``explode(sequence(...))`` fans out JVM-side; no calendar join needed
    because the sub-steps are derivable from each row's own timestamp.
    """
    if source_seconds % target_seconds:
        raise ValueError("source resolution must be a multiple of target")
    steps = source_seconds // target_seconds
    ts = F.col(time_column)
    seq = F.sequence(
        ts,
        ts + F.expr(f"INTERVAL {source_seconds - target_seconds} SECONDS"),
        F.expr(f"INTERVAL {target_seconds} SECONDS"),
    )
    out = df.withColumn(time_column, F.explode(seq))
    if measurement_type == MeasurementType.TOTAL:
        out = out.withColumn(value_column, F.col(value_column) / steps)
    return out


def convert_time_interval(
    df: DataFrame,
    time_column: str,
    from_type: TimeIntervalType,
    to_type: TimeIntervalType,
    frequency_seconds: int,
) -> DataFrame:
    """Re-label timestamps between period-beginning and period-ending.

    Reference dsgrid/dimension/time.py:95-116: a period-ending stamp t
    labels (t-freq, t]; relabeling it period-beginning shifts it to
    t-freq (and vice versa). INSTANTANEOUS cannot be converted — the
    value is a point sample, not a span.
    """
    if from_type == to_type:
        return df
    if TimeIntervalType.INSTANTANEOUS in (from_type, to_type):
        raise ValueError(
            "cannot convert between instantaneous and period interval types"
        )
    shift = (-frequency_seconds
             if to_type == TimeIntervalType.PERIOD_BEGINNING
             else frequency_seconds)
    return df.withColumn(
        time_column,
        F.timestamp_seconds(F.unix_timestamp(F.col(time_column)) + shift),
    )


def convert_time_zone(df: DataFrame, time_column: str, to_tz: str,
                      from_tz: str = "UTC") -> DataFrame:
    """Shift a (naive-rendered) timestamp column between zones.

    Reference query_submitter.py:335-457 single-tz conversion: output is
    wall-clock time in ``to_tz``.
    """
    return df.withColumn(
        time_column,
        F.from_utc_timestamp(F.to_utc_timestamp(F.col(time_column), from_tz), to_tz),
    )


def convert_time_zone_by_geography(
    df: DataFrame,
    time_column: str,
    geography_records: DataFrame,
    geography_column: str,
    from_tz: str = "UTC",
    time_zone_column: str = "time_zone",
) -> DataFrame:
    """Per-row time zone from the geography dimension records.

    Output keeps local wall-clock time plus the ``time_zone`` column
    (reference query_submitter.py:393-444). Broadcast join; the per-row
    ``from_utc_timestamp(ts, col)`` accepts a column zone id.
    """
    recs = geography_records.select(
        F.col("id").alias("__gid"), F.col(time_zone_column).alias(time_zone_column)
    )
    out = df.join(F.broadcast(recs), df[geography_column] == F.col("__gid"), "inner")
    out = out.drop("__gid")
    return out.withColumn(
        time_column,
        F.from_utc_timestamp(
            F.to_utc_timestamp(F.col(time_column), from_tz),
            F.col(time_zone_column),
        ),
    )


def adjust_leap_day(df: DataFrame, time_column: str,
                    adjustment: LeapDayAdjustmentType) -> DataFrame:
    """DROP_FEB29 / DROP_DEC31 / DROP_JAN1 (reference time.py:53-92)."""
    ts = F.col(time_column)
    if adjustment == LeapDayAdjustmentType.NONE:
        return df
    if adjustment == LeapDayAdjustmentType.DROP_FEB29:
        return df.filter(~((F.month(ts) == 2) & (F.dayofmonth(ts) == 29)))
    if adjustment == LeapDayAdjustmentType.DROP_DEC31:
        return df.filter(~((F.month(ts) == 12) & (F.dayofmonth(ts) == 31)))
    if adjustment == LeapDayAdjustmentType.DROP_JAN1:
        return df.filter(~((F.month(ts) == 1) & (F.dayofmonth(ts) == 1)))
    raise ValueError(adjustment)


def adjust_daylight_saving(
    df: DataFrame,
    time_column: str,
    adjustment: DaylightSavingAdjustmentType,
    time_zone: str,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Handle standard-time data mapped onto a DST-observing zone.

    - spring-forward: the 02:00 local hour doesn't exist → drop it;
    - fall-back: the 01:00 local hour repeats → duplicate the source hour
      (or interpolate between neighbors).

    The nonexistent/repeated hours are detected with pure column math:
    an hour is *spring-forward* if the utc-offset grows between ts and
    ts+1h, *fall-back* if it shrinks. Offsets come from comparing
    ``to_utc_timestamp`` round-trips — no tz tables in our code.
    """
    if adjustment == DaylightSavingAdjustmentType.NONE:
        return df
    ts = F.col(time_column)
    one_h = F.expr("INTERVAL 1 HOURS")
    # utc offset (seconds) at local wall-clock time t: t - to_utc(t)
    def _offset(t):
        return F.unix_timestamp(t) - F.unix_timestamp(F.to_utc_timestamp(t, time_zone))

    delta_next = _offset(ts + one_h) - _offset(ts)
    spring = delta_next > 0
    fall = delta_next < 0
    out = df.filter(~spring)  # drop the nonexistent hour
    dup = df.filter(fall)
    if adjustment == DaylightSavingAdjustmentType.DROP_SPRING_FORWARD_INTERPOLATE_FALLBACK:
        nxt = df.select(
            (F.col(time_column) - one_h).alias(time_column),
            *[c for c in df.columns if c not in (time_column, value_column)],
            F.col(value_column).alias("__next_v"),
        )
        keys = [c for c in df.columns if c != value_column]
        dup = (
            dup.join(nxt, keys, "left")
            .withColumn(
                value_column,
                (F.col(value_column) + F.coalesce(F.col("__next_v"), F.col(value_column))) / 2.0,
            )
            .drop("__next_v")
        )
    dup = dup.withColumn(time_column, ts + one_h)
    return out.unionByName(dup)


def wrap_time(df: DataFrame, time_column: str, start, end) -> DataFrame:
    """Wrap dataset timestamps onto [start, end) modularly.

    ``wrap_time_allowed`` (reference models.py:631-635): a dataset whose
    range is shifted relative to the project range is rotated onto it.
    """
    start_c = F.lit(str(start)).cast("timestamp")
    end_c = F.lit(str(end)).cast("timestamp")
    span = F.unix_micros(end_c) - F.unix_micros(start_c)
    pos = F.unix_micros(F.col(time_column).cast("timestamp")) - F.unix_micros(start_c)
    wrapped = F.timestamp_micros(F.unix_micros(start_c) + ((pos % span) + span) % span)
    return df.withColumn(time_column, wrapped)
