"""Dataset schema handlers.

Reference dsgrid/dataset/dataset_schema_handler_one_table.py and
_two_table.py: normalize any registered layout into the canonical stacked
DataFrame (string dims + time + value), then run the mapping plan.
"""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from dsgrid_spark.common import (
    SCALING_FACTOR_COLUMN,
    TWO_TABLE_ID_COLUMN,
    VALUE_COLUMN,
)
from dsgrid_spark.operators.mapping import (
    apply_fraction,
    apply_scaling_factor,
    map_stacked_dimension,
)
from dsgrid_spark.operators.reshape import unpivot


class DatasetConfig(BaseModel):
    """Registered layout of a dataset (reference dataset_config.py).

    - ``trivial_dimensions``: dimension → single record id, stored
      implicitly, added as a literal column on load
      (reference dataset_config.py:851-871).
    - ``pivoted_columns``: when the stored value format is PIVOTED, the
      record-id value columns to unpivot into (dimension, value).
    """

    dataset_id: str
    time_columns: list[str] = Field(default_factory=lambda: ["timestamp"])
    trivial_dimensions: dict[str, str] = Field(default_factory=dict)
    pivoted_columns: list[str] = Field(default_factory=list)
    pivoted_dimension: Optional[str] = None


def _add_trivial_dimensions(df: DataFrame, config: DatasetConfig) -> DataFrame:
    for dim, record_id in config.trivial_dimensions.items():
        df = df.withColumn(dim, F.lit(record_id))
    return df


def _convert_int_dims_to_string(df: DataFrame, config: DatasetConfig) -> DataFrame:
    """Dimension columns are strictly StringType; cast int-typed
    model_year/weather_year on load (reference utils/dataset.py:783-794)."""
    for c in df.columns:
        if c in config.time_columns or c in (VALUE_COLUMN, SCALING_FACTOR_COLUMN,
                                             TWO_TABLE_ID_COLUMN):
            continue
        if not isinstance(df.schema[c].dataType, StringType):
            df = df.withColumn(c, F.col(c).cast("string"))
    return df


class OneTableHandler:
    """ONE_TABLE layout: dims + time + value in a single table.

    Reference dataset_schema_handler_one_table.py:31-177.
    """

    def __init__(self, df: DataFrame, config: DatasetConfig):
        from dsgrid_spark.operators.missing import split_expected_missing

        self.config = config
        self.expected_missing: DataFrame | None = None
        if config.pivoted_columns:
            df = unpivot(
                df,
                config.pivoted_columns,
                config.pivoted_dimension or "metric",
                drop_nulls=False,
            )
            # NULL cells mark expected-missing associations: keep them
            # aside so mapping/aggregation never sees them, re-addable via
            # restore_expected_missing (reference utils/dataset.py:820-830)
            df, self.expected_missing = split_expected_missing(df)
        df = _add_trivial_dimensions(df, config)
        self.df = _convert_int_dims_to_string(df, config)

    def check_columns(self, allowed: set[str]) -> None:
        """Allowed-columns check (reference one_table :96-113)."""
        extra = [c for c in self.df.columns if c not in allowed]
        if extra:
            raise ValueError(f"{self.config.dataset_id}: unexpected columns {extra}")

    def make_project_dataframe(self, mappings: dict[str, DataFrame]) -> DataFrame:
        """Map each dimension per plan, then collapse fractions once."""
        df = self.df
        for column, records in mappings.items():
            df = map_stacked_dimension(df, records, column)
        df = apply_scaling_factor(df)
        return apply_fraction(df)


class TwoTableHandler:
    """TWO_TABLE layout: load_data(id, time, value) ⋈ load_data_lookup(id, dims).

    Reference dataset_schema_handler_two_table.py:41-169. At scale the
    lookup is small (one row per time-array) → broadcast join, the fact
    table never shuffles.
    """

    def __init__(self, load_data: DataFrame, lookup: DataFrame,
                 config: DatasetConfig,
                 broadcast_lookup: bool | None = None):
        self.config = config
        self.load_data = load_data
        # Same contract as flag_outliers' broadcast_stats (ADVICE r4):
        # True forces the hint (the reference's lookup tables are one row
        # per time-array — tiny); False forbids it; None lets AQE measure
        # the lookup's actual size — the safe default after the sf10
        # rehearsal showed a forced broadcast of a 15M-row lookup
        # collects it into the driver.
        self.broadcast_lookup = broadcast_lookup
        self.lookup = _convert_int_dims_to_string(
            _add_trivial_dimensions(lookup, config), config
        )

    def check_id_consistency(self) -> None:
        """load and lookup must reference identical id sets
        (reference two_table :266-290)."""
        from dsgrid_spark.operators.setops import symmetric_difference

        ld = self.load_data.select(TWO_TABLE_ID_COLUMN).distinct()
        lk = self.lookup.select(TWO_TABLE_ID_COLUMN).distinct()
        diff = symmetric_difference(ld, lk).limit(100).collect()
        if diff:
            raise ValueError(
                f"{self.config.dataset_id}: load/lookup id mismatch, e.g. "
                f"{[r[0] for r in diff[:5]]}"
            )

    def to_stacked(self) -> DataFrame:
        lookup = (F.broadcast(self.lookup) if self.broadcast_lookup
                  else self.lookup)
        joined = self.load_data.join(
            lookup, TWO_TABLE_ID_COLUMN, "inner"
        ).drop(TWO_TABLE_ID_COLUMN)
        return apply_scaling_factor(joined)

    def make_project_dataframe(self, mappings: dict[str, DataFrame]) -> DataFrame:
        df = self.to_stacked()
        for column, records in mappings.items():
            df = map_stacked_dimension(df, records, column)
        return apply_fraction(df)
