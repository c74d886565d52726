"""Time-engine tests with independently computed goldens."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.dimensions import (
    LeapDayAdjustmentType,
    MeasurementType,
    RepresentativePeriodFormat,
)
from dsgrid_spark.timedim.annual import annual_to_hourly, datetime_to_annual
from dsgrid_spark.timedim.calendar import (
    check_time_consistency,
    datetime_calendar,
    hourly_calendar_for_year,
)
from dsgrid_spark.timedim.conversion import (
    adjust_leap_day,
    convert_time_zone,
    convert_time_zone_by_geography,
    downsample,
    upsample,
    wrap_time,
)
from dsgrid_spark.timedim.index_time import index_to_datetime
from dsgrid_spark.timedim.representative import representative_to_datetime


def test_calendar_sizes(spark):
    assert hourly_calendar_for_year(spark, 2018).count() == 8760
    assert hourly_calendar_for_year(spark, 2020).count() == 8784  # leap
    cal = datetime_calendar(spark, "2018-01-01", "2018-01-02", 3600)
    assert cal.count() == 25  # inclusive endpoints


def test_time_consistency_pass_and_fail(spark):
    cal = datetime_calendar(spark, "2018-01-01 00:00:00", "2018-01-01 03:00:00", 3600)
    rows = [
        (dt.datetime(2018, 1, 1, h), g, 1.0)
        for h in range(4) for g in ("a", "b")
    ]
    df = spark.createDataFrame(rows, "timestamp timestamp, geo string, value double")
    check_time_consistency(df, cal)  # complete: no raise
    with pytest.raises(ValueError):
        check_time_consistency(df.limit(7), cal)  # one combo incomplete
    bad = df.withColumn(
        "timestamp", F.col("timestamp") + F.expr("INTERVAL 10 HOURS")
    )
    with pytest.raises(ValueError):
        check_time_consistency(bad, cal)


def test_downsample_total_and_mean(spark):
    rows = [(dt.datetime(2018, 1, 1, h), "a", float(h)) for h in range(24)]
    df = spark.createDataFrame(rows, "ts timestamp, geo string, value double")
    tot = downsample(df, "ts", 6 * 3600, MeasurementType.TOTAL)
    got = {r["ts"].hour: r["value"] for r in tot.collect()}
    assert got == {0: sum(range(6)), 6: sum(range(6, 12)),
                   12: sum(range(12, 18)), 18: sum(range(18, 24))}
    mean = downsample(df, "ts", 6 * 3600, MeasurementType.MEAN)
    got_m = {r["ts"].hour: r["value"] for r in mean.collect()}
    assert got_m[0] == pytest.approx(2.5)


def test_upsample_total_divides(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 1, 1), "a", 24.0)], "ts timestamp, geo string, value double"
    )
    up = upsample(df, "ts", 86400, 3600, MeasurementType.TOTAL)
    rows = up.collect()
    assert len(rows) == 24
    assert all(r["value"] == pytest.approx(1.0) for r in rows)
    # measured repeats instead of dividing
    up2 = upsample(df, "ts", 86400, 3600, MeasurementType.MEASURED)
    assert all(r["value"] == 24.0 for r in up2.collect())


def test_annual_roundtrip(spark):
    df = spark.createDataFrame(
        [("2018", "a", 8760.0), ("2020", "a", 8784.0)],
        "model_year string, geo string, value double",
    )
    hourly = annual_to_hourly(df)
    assert hourly.count() == 8760 + 8784
    # TOTAL spread: each hour gets 1.0
    assert hourly.select("value").distinct().collect()[0][0] == pytest.approx(1.0)
    back = datetime_to_annual(hourly.drop("model_year"), "timestamp", "year")
    got = {str(r["year"]): r["value"] for r in back.collect()}
    assert got["2018"] == pytest.approx(8760.0)
    assert got["2020"] == pytest.approx(8784.0)


def test_tz_conversion_fixed_offset(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 6, 1, 12, 0), 1.0)], "ts timestamp, value double"
    )
    out = convert_time_zone(df, "ts", "Etc/GMT+7")  # UTC-7
    assert out.collect()[0]["ts"] == dt.datetime(2018, 6, 1, 5, 0)


def test_tz_conversion_dst_zone(spark):
    # America/Denver: UTC-7 in winter, UTC-6 in summer
    df = spark.createDataFrame(
        [(dt.datetime(2018, 1, 15, 12, 0), 1.0), (dt.datetime(2018, 7, 15, 12, 0), 1.0)],
        "ts timestamp, value double",
    )
    out = sorted(r["ts"] for r in convert_time_zone(df, "ts", "America/Denver").collect())
    assert out[0] == dt.datetime(2018, 1, 15, 5, 0)
    assert out[1] == dt.datetime(2018, 7, 15, 6, 0)


def test_tz_by_geography(spark, geography_records):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 1, 15, 12, 0), "06037", 1.0),
         (dt.datetime(2018, 1, 15, 12, 0), "08031", 1.0)],
        "ts timestamp, geography string, value double",
    )
    out = convert_time_zone_by_geography(df, "ts", geography_records, "geography")
    got = {r["geography"]: r["ts"] for r in out.collect()}
    assert got["06037"] == dt.datetime(2018, 1, 15, 4, 0)  # LA, UTC-8 winter
    assert got["08031"] == dt.datetime(2018, 1, 15, 5, 0)  # Denver, UTC-7


def test_leap_day_adjustments(spark):
    rows = [(dt.datetime(2020, 2, 28), 1.0), (dt.datetime(2020, 2, 29), 2.0),
            (dt.datetime(2020, 12, 31), 3.0), (dt.datetime(2020, 1, 1), 4.0)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    assert adjust_leap_day(df, "ts", LeapDayAdjustmentType.DROP_FEB29).count() == 3
    assert adjust_leap_day(df, "ts", LeapDayAdjustmentType.DROP_DEC31).count() == 3
    assert adjust_leap_day(df, "ts", LeapDayAdjustmentType.DROP_JAN1).count() == 3
    assert adjust_leap_day(df, "ts", LeapDayAdjustmentType.NONE).count() == 4


def test_wrap_time_modular(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 1, 9, 5, 0),), (dt.datetime(2018, 1, 3, 1, 30),)],
        "ts timestamp",
    )
    out = wrap_time(df, "ts", "2018-01-01 00:00:00", "2018-01-08 00:00:00")
    got = sorted(r["ts"] for r in out.collect())
    assert got == [dt.datetime(2018, 1, 2, 5, 0), dt.datetime(2018, 1, 3, 1, 30)]


def test_index_time_single_zone(spark):
    df = spark.createDataFrame([(0, 1.0), (5, 2.0)], "time_index int, value double")
    out = index_to_datetime(df, "2018-01-01 00:00:00", 3600)
    got = sorted(r["timestamp"] for r in out.collect())
    assert got == [dt.datetime(2018, 1, 1, 0), dt.datetime(2018, 1, 1, 5)]


def test_index_time_per_geography(spark):
    df = spark.createDataFrame(
        [(0, "06037", 1.0), (0, "08031", 1.0)],
        "time_index int, geography string, value double",
    )
    geo = spark.createDataFrame(
        [("06037", "Etc/GMT+8"), ("08031", "Etc/GMT+7")],
        "id string, time_zone string",
    )
    out = index_to_datetime(df, "2018-01-01 00:00:00", 3600,
                            geography_records=geo, geography_column="geography")
    got = {r["geography"]: r["timestamp"] for r in out.collect()}
    # index 0 == local midnight → UTC instant shifted by zone offset
    assert got["06037"] == dt.datetime(2018, 1, 1, 8)
    assert got["08031"] == dt.datetime(2018, 1, 1, 7)


def test_representative_period_hours_per_template_key(spark):
    # template: every (month=1, dow, hour) combo for one geography
    rows = [(1, d, h, "06037", 1.0) for d in range(7) for h in range(24)]
    df = spark.createDataFrame(
        rows, "month int, day_of_week int, hour int, geography string, value double"
    )
    geo = spark.createDataFrame(
        [("06037", "Etc/GMT+8")], "id string, time_zone string"
    )
    out = representative_to_datetime(
        df, geo, 2018, RepresentativePeriodFormat.ONE_WEEK_PER_MONTH_BY_HOUR,
        geography_column="geography",
    )
    # every local-January hour of 2018 matched exactly once
    assert out.count() == 31 * 24
    assert out.columns == ["geography", "value", "timestamp"]


def test_external_tz_localize_and_align_roundtrip(spark):
    """DATETIME_EXTERNAL_TZ: naive wall clock -> absolute, and back
    (aligned_in_clock_time)."""
    from dsgrid_spark.timedim.external import (
        align_to_clock_time,
        localize_external_tz,
    )

    df = spark.createDataFrame(
        [(dt.datetime(2024, 6, 1, 0), "06037", 1.0),
         (dt.datetime(2024, 6, 1, 0), "08031", 2.0)],
        "timestamp timestamp, geography string, value double",
    )
    geo = spark.createDataFrame(
        [("06037", "Etc/GMT+8"), ("08031", "Etc/GMT+7")],
        "id string, time_zone string",
    )
    absolute = localize_external_tz(df, "timestamp", geography_records=geo)
    got = {r["geography"]: r["timestamp"] for r in absolute.collect()}
    # same wall clock, different absolute instants
    assert got["06037"] == dt.datetime(2024, 6, 1, 8)
    assert got["08031"] == dt.datetime(2024, 6, 1, 7)

    back = align_to_clock_time(absolute, "timestamp", geography_records=geo)
    clock = {r["geography"]: r["timestamp"] for r in back.collect()}
    assert clock == {"06037": dt.datetime(2024, 6, 1, 0),
                     "08031": dt.datetime(2024, 6, 1, 0)}

    single = localize_external_tz(df, "timestamp", time_zone="Etc/GMT+5")
    assert {r["timestamp"] for r in single.collect()} == {dt.datetime(2024, 6, 1, 5)}
    with pytest.raises(ValueError, match="exactly one"):
        localize_external_tz(df, "timestamp")


def test_convert_time_interval(spark):
    from dsgrid_spark.dimensions import TimeIntervalType
    from dsgrid_spark.timedim.conversion import convert_time_interval

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 1), 1.0)], "timestamp timestamp, value double"
    )
    pb = convert_time_interval(df, "timestamp",
                               TimeIntervalType.PERIOD_ENDING,
                               TimeIntervalType.PERIOD_BEGINNING, 3600)
    assert pb.collect()[0]["timestamp"] == dt.datetime(2024, 1, 1, 0)
    pe = convert_time_interval(pb, "timestamp",
                               TimeIntervalType.PERIOD_BEGINNING,
                               TimeIntervalType.PERIOD_ENDING, 3600)
    assert pe.collect()[0]["timestamp"] == dt.datetime(2024, 1, 1, 1)
    # same-type is a no-op (identical plan, no shift)
    same = convert_time_interval(df, "timestamp",
                                 TimeIntervalType.PERIOD_ENDING,
                                 TimeIntervalType.PERIOD_ENDING, 3600)
    assert same is df
    with pytest.raises(ValueError, match="instantaneous"):
        convert_time_interval(df, "timestamp",
                              TimeIntervalType.INSTANTANEOUS,
                              TimeIntervalType.PERIOD_BEGINNING, 3600)


def test_noop_time_dataset_registers_and_queries(spark, tmp_path):
    """NOOP time kind: no time column at all — registration validation
    and queries skip time ops (reference dimensions.py:858)."""
    from dsgrid_spark.datasets.handlers import DatasetConfig
    from dsgrid_spark.registry.store import RegistryStore

    store = RegistryStore(tmp_path / "reg", spark)
    df = spark.createDataFrame(
        [("06037", 1.0), ("08031", 2.0)], "geography string, value double"
    )
    v = store.register_dataset(
        "annualless", df,
        config=DatasetConfig(dataset_id="annualless", time_columns=[]),
    )
    assert v == "1.0.0"
    loaded, cfg = store.load_catalog().dataset("annualless")
    assert cfg.time_columns == []
    assert loaded.count() == 2


def test_rollup_cascade_levels_and_reuse(spark):
    """hour/day/month cascade: coarser levels re-aggregate finer
    partials exactly; the union plan reuses the finest-level exchange
    (raw data shuffled once)."""
    from dsgrid_spark.timedim.conversion import rollup_cascade

    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), "a", 1.0),
        (dt.datetime(2024, 1, 1, 0, 50), "a", 2.0),
        (dt.datetime(2024, 1, 1, 3, 0), "a", 4.0),
        (dt.datetime(2024, 2, 2, 0, 0), "a", 8.0),
        (dt.datetime(2024, 1, 1, 0, 0), "b", 16.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, grp string, value double")
    out = rollup_cascade(df, "ts", ["grp"], "value")
    got = {(r["level"], r["ts"], r["grp"]): (r["value"], r["n_rows"])
           for r in out.collect()}
    assert got[("hour", dt.datetime(2024, 1, 1, 0), "a")] == (3.0, 2)
    assert got[("day", dt.datetime(2024, 1, 1), "a")] == (7.0, 3)
    assert got[("month", dt.datetime(2024, 1, 1), "a")] == (7.0, 3)
    assert got[("month", dt.datetime(2024, 2, 1), "a")] == (8.0, 1)
    assert got[("month", dt.datetime(2024, 1, 1), "b")] == (16.0, 1)
    # 3 levels over (hour: 3a+1b ... ) → hour 4, day 3, month 3 rows
    assert len(got) == 10

    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )
    assert "ReusedExchange" in plan
