"""Annual time: consistency + annual→hourly expansion.

Reference dsgrid/config/annual_time_dimension_config.py:51-194.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.common import VALUE_COLUMN
from dsgrid_spark.dimensions import MeasurementType


def annual_to_hourly(
    df: DataFrame,
    year_column: str = "model_year",
    time_column: str = "timestamp",
    measurement_type: MeasurementType = MeasurementType.TOTAL,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Expand each annual row to that year's hourly timestamps.

    Reference annual_time_dimension_config.py:152-194 cross-joins a
    pre-built calendar; we explode a per-row ``sequence()`` instead —
    same fan-out, no join, leap years handled by the sequence itself.
    TOTAL divides by the year's hour count (8760/8784); other measurement
    types repeat the value.
    """
    y = F.col(year_column).cast("int")
    start = F.make_timestamp(y, F.lit(1), F.lit(1), F.lit(0), F.lit(0), F.lit(0))
    end = F.make_timestamp(y, F.lit(12), F.lit(31), F.lit(23), F.lit(0), F.lit(0))
    out = df.withColumn(
        time_column, F.explode(F.sequence(start, end, F.expr("INTERVAL 1 HOURS")))
    )
    if measurement_type == MeasurementType.TOTAL:
        hours = F.when(
            (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)), F.lit(8784.0)
        ).otherwise(F.lit(8760.0))
        out = out.withColumn(value_column, F.col(value_column) / hours)
    return out


def datetime_to_annual(
    df: DataFrame,
    time_column: str = "timestamp",
    year_column: str = "year",
    measurement_type: MeasurementType = MeasurementType.TOTAL,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Collapse datetime rows to one row per year (sum/avg per type)."""
    agg = {
        MeasurementType.TOTAL: F.sum,
        MeasurementType.MEAN: F.avg,
        MeasurementType.MIN: F.min,
        MeasurementType.MAX: F.max,
        MeasurementType.MEASURED: F.avg,
    }[measurement_type]
    dims = [c for c in df.columns if c not in (time_column, value_column)]
    return (
        df.withColumn(year_column, F.year(F.col(time_column)))
        .groupBy(year_column, *dims)
        .agg(agg(value_column).alias(value_column))
    )
