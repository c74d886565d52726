"""Expected-missing (NULL value) row semantics.

In the reference, NULL ``value`` rows mark dimension associations that are
*expected* to have no data (e.g. a county with no natural-gas heating).
They are split off before mapping/aggregation — so they never pollute
sums — and re-added afterwards so consumers can distinguish
"expected-missing" from "absent" (dsgrid/utils/dataset.py:820-830,
:123-140, :676-692).

All three operators are narrow DataFrame transformations: a partition-
local filter split, a union, and one aggregate-and-semi-join — nothing
here shuffles more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.common import VALUE_COLUMN


def split_expected_missing(
    df: DataFrame, value_column: str = VALUE_COLUMN
) -> tuple[DataFrame, DataFrame]:
    """Split into (data, expected_missing) on NULL value.

    Reference dsgrid/utils/dataset.py:123-140 (remove_null_rows).
    """
    is_null = F.col(value_column).isNull()
    return df.filter(~is_null), df.filter(is_null)


def restore_expected_missing(
    df: DataFrame, missing: DataFrame
) -> DataFrame:
    """Re-add expected-missing rows after processing.

    Columns created during processing (e.g. mapped dimension names) are
    NULL on the restored rows; columns dropped during processing are
    dropped from the missing rows too (reference utils/dataset.py:820-830
    re-adds with exceptAll semantics — unionByName is the Spark-native
    equivalent once columns are aligned).
    """
    missing = missing.select(
        *[c for c in missing.columns if c in df.columns]
    )
    return df.unionByName(missing, allowMissingColumns=True)


def drop_invalid_null_time_rows(
    df: DataFrame,
    time_column: str,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """After aggregation, drop NULL-time rows whose dimension combination
    also has real (non-NULL-time) data.

    A NULL timestamp is only meaningful when the combination has *no*
    real rows at all (reference dsgrid/utils/dataset.py:676-692, trigger
    table_format_handler_base.py:238-257). One aggregate + broadcast
    anti-join.
    """
    group_cols = [c for c in df.columns if c not in (time_column, value_column)]
    if not group_cols:
        return df.filter(F.col(time_column).isNotNull())
    has_real = (
        df.filter(F.col(time_column).isNotNull())
        .select(*group_cols)
        .distinct()
    )
    null_rows = df.filter(F.col(time_column).isNull())
    keepable_nulls = null_rows.join(has_real, group_cols, "left_anti")
    return df.filter(F.col(time_column).isNotNull()).unionByName(keepable_nulls)
