"""Index time → datetime.

Reference dsgrid/config/index_time_dimension_config.py:17-81: an integer
``time_index`` column plus a configured start + resolution, interpreted in
each row's LOCAL time zone (joined from geography records), becomes a real
timestamp column.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.operators.mapping import add_column_from_records


def index_to_datetime(
    df: DataFrame,
    start: datetime | str,
    resolution_seconds: int,
    index_column: str = "time_index",
    time_column: str = "timestamp",
    geography_records: DataFrame | None = None,
    geography_column: str = "geography",
) -> DataFrame:
    """timestamp = local(start) + index * resolution, per-row time zone.

    Without geography records the start is taken as given (single zone).
    With them, each row's ``time_zone`` shifts the start so that index 0
    is local midnight of the configured start (reference :17-81).
    """
    base = F.lit(str(start)).cast("timestamp")
    offset = (F.col(index_column).cast("long") * resolution_seconds)
    if geography_records is None:
        ts = F.timestamp_seconds(F.unix_timestamp(base) + offset)
        return df.withColumn(time_column, ts).drop(index_column)
    out = add_column_from_records(df, geography_records, geography_column)
    local_base = F.to_utc_timestamp(base, F.col("time_zone"))
    ts = F.timestamp_seconds(F.unix_timestamp(local_base) + offset)
    return out.withColumn(time_column, ts).drop(index_column, "time_zone")
