"""Registration-time validation gauntlet.

The reference rejects bad datasets AT REGISTRATION, not at query time
(dsgrid/dataset/dataset_schema_handler_base.py:323-452,
dataset_schema_handler_one_table.py:96-144,
dataset_schema_handler_two_table.py:212-290). Every check here is a
distributed aggregate/anti-join that short-circuits via ``limit(1)`` —
no driver-side row scans, so the gauntlet runs unchanged on a 100 TB
dataset.

Order (mirrors the reference):
1. allowed/expected columns
2. dimension columns must be string-typed (ints are auto-cast; anything
   else is rejected)
3. no NULLs in dimension or time columns (NULL value = expected-missing
   is allowed)
4. two-table load/lookup id consistency
5. dataset dimension ids ⊆ registered dimension records
6. time consistency: every dimension combination carries the identical,
   complete timestamp set
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import IntegerType, LongType, ShortType, StringType

from dsgrid_spark.common import (
    SCALING_FACTOR_COLUMN,
    TWO_TABLE_ID_COLUMN,
    VALUE_COLUMN,
)
from dsgrid_spark.datasets.handlers import (
    DatasetConfig,
    OneTableHandler,
    TwoTableHandler,
)
from dsgrid_spark.operators.filters import assert_no_nulls


class DatasetValidationError(ValueError):
    def __init__(self, check: str, message: str):
        self.check = check
        super().__init__(f"[{check}] {message}")


_NON_DIM = {VALUE_COLUMN, SCALING_FACTOR_COLUMN, TWO_TABLE_ID_COLUMN}
_CASTABLE = (StringType, IntegerType, LongType, ShortType)


def _dim_columns(df: DataFrame, config: DatasetConfig) -> list[str]:
    return [c for c in df.columns
            if c not in config.time_columns and c not in _NON_DIM]


def check_allowed_columns(df: DataFrame, config: DatasetConfig,
                          allowed_dimensions: Optional[set[str]]) -> None:
    """Reference one_table:96-113: only known dimension/time/value
    columns may appear."""
    if allowed_dimensions is None:
        return
    allowed = set(allowed_dimensions) | set(config.time_columns) | _NON_DIM
    allowed |= set(config.pivoted_columns)
    extra = [c for c in df.columns if c not in allowed]
    if extra:
        raise DatasetValidationError(
            "allowed_columns",
            f"{config.dataset_id}: unexpected columns {extra} "
            f"(allowed: {sorted(allowed)})",
        )


def check_string_dimensions(df: DataFrame, config: DatasetConfig) -> None:
    """Dimension columns are strictly StringType; int types are cast on
    load, anything else is rejected (reference one_table:109-111,
    utils/dataset.py:783-794)."""
    for c in _dim_columns(df, config):
        t = df.schema[c].dataType
        if not isinstance(t, _CASTABLE):
            raise DatasetValidationError(
                "string_dimensions",
                f"{config.dataset_id}: dimension column {c!r} has type "
                f"{t.simpleString()}; only string (or castable int) allowed",
            )


def check_dimension_records(df: DataFrame, config: DatasetConfig,
                            dimension_records: dict[str, DataFrame]) -> None:
    """Dataset dimension ids must all exist in the registered dimension's
    records (reference schema_handler_base record checks)."""
    for dim, records in dimension_records.items():
        if dim not in df.columns:
            continue
        unknown = (
            df.select(F.col(dim).cast("string").alias(dim)).distinct()
            .join(F.broadcast(records.select(F.col("id").alias(dim))),
                  [dim], "left_anti")
            .limit(5).collect()
        )
        if unknown:
            raise DatasetValidationError(
                "dimension_records",
                f"{config.dataset_id}: {dim} ids not in dimension records: "
                f"{[r[0] for r in unknown]}",
            )


def check_time_consistency_all_combos(df: DataFrame, config: DatasetConfig,
                                      calendar: Optional[DataFrame]) -> None:
    """Every dimension combination must carry the identical, complete
    timestamp set (reference schema_handler_base:323-452). With no
    configured calendar, the expected set is the distinct timestamps in
    the data — which still catches ragged combos."""
    time_cols = [c for c in config.time_columns if c in df.columns]
    if not time_cols:
        return
    tc = time_cols[0]
    data = df.filter(F.col(tc).isNotNull())
    if calendar is None:
        calendar = data.select(tc).distinct()
    from dsgrid_spark.timedim.calendar import check_time_consistency

    try:
        check_time_consistency(data, calendar, time_column=tc,
                               value_column=VALUE_COLUMN)
    except ValueError as e:
        raise DatasetValidationError("time_consistency", str(e)) from e


def validate_dataset(spark: SparkSession, source,
                     config: DatasetConfig,
                     lookup_source=None,
                     dimension_records: Optional[dict[str, DataFrame]] = None,
                     calendar: Optional[DataFrame] = None) -> None:
    """Run the full gauntlet; raises DatasetValidationError on the first
    failed check. Nothing is written by this function — callers gate
    registration on it."""
    from dsgrid_spark.registry.store import as_dataframe

    df = as_dataframe(spark, source)
    dimension_records = dimension_records or {}

    allowed = set(dimension_records) or None
    check_allowed_columns(df, config, allowed)
    check_string_dimensions(df, config)

    if lookup_source is not None:
        lookup = as_dataframe(spark, lookup_source)
        check_string_dimensions(lookup, config)
        handler = TwoTableHandler(df, lookup, config)
        try:
            handler.check_id_consistency()
        except ValueError as e:
            raise DatasetValidationError("id_consistency", str(e)) from e
        stacked = handler.to_stacked()
    else:
        stacked = OneTableHandler(df, config).df

    # NULL dims/time are errors; NULL value rows are expected-missing and
    # were already split off by the one-table handler
    try:
        assert_no_nulls(stacked, exclude=[VALUE_COLUMN])
    except ValueError as e:
        raise DatasetValidationError("no_nulls", str(e)) from e

    check_dimension_records(stacked, config, dimension_records)
    check_time_consistency_all_combos(stacked, config, calendar)
