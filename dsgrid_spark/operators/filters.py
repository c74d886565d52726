"""The six dimension-filter types.

Reference dsgrid/dimension/dimension_filters.py:91-308. Each filter is a
declarative model applied as a DataFrame predicate or semi-join; Catalyst
pushes the predicates into the parquet scan, which the reference had to do
by hand ("prefilter", dataset_schema_handler_base.py:592-646).
"""

from __future__ import annotations

from typing import Any, Literal, Union

from pydantic import BaseModel, Field
from pyspark.sql import Column, DataFrame, functions as F


class ExpressionFilter(BaseModel):
    """``column <op> value`` — reference dimension_filters.py:91-114."""

    filter_type: Literal["expression"] = "expression"
    column: str
    operator: str  # ==, !=, <, <=, >, >=
    value: Any

    def apply(self, df: DataFrame) -> DataFrame:
        c = F.col(self.column)
        ops = {
            "==": c == self.value, "!=": c != self.value,
            "<": c < self.value, "<=": c <= self.value,
            ">": c > self.value, ">=": c >= self.value,
        }
        if self.operator not in ops:
            raise ValueError(f"unsupported operator {self.operator!r}")
        return df.filter(ops[self.operator])


class RawExpressionFilter(BaseModel):
    """Verbatim SQL predicate — reference dimension_filters.py:117-141."""

    filter_type: Literal["raw"] = "raw"
    expression: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.expression)


class ColumnOperatorFilter(BaseModel):
    """Column-method filters (isin, like, startswith, ...), negatable.

    Reference dimension_filters.py:144-198.
    """

    filter_type: Literal["column_operator"] = "column_operator"
    column: str
    operator: Literal[
        "contains", "endswith", "isNotNull", "isNull", "isin",
        "like", "rlike", "startswith",
    ]
    value: Any = None
    negate: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.column)
        method = getattr(col, self.operator)
        if self.operator in ("isNull", "isNotNull"):
            cond: Column = method()
        elif self.operator == "isin":
            cond = method(*self.value)
        else:
            cond = method(self.value)
        return df.filter(~cond if self.negate else cond)


class BetweenFilter(BaseModel):
    """Inclusive range, negatable — reference dimension_filters.py:201-229."""

    filter_type: Literal["between"] = "between"
    column: str
    lower: Any
    upper: Any
    negate: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        cond = F.col(self.column).between(self.lower, self.upper)
        return df.filter(~cond if self.negate else cond)


class SubsetFilter(BaseModel):
    """Keep rows whose dimension value is in a subset record table.

    Reference dimension_filters.py:232-276 applies this as inner-join+drop;
    the semantics are a semi-join, which Spark executes broadcast-side
    without widening rows.

    ``record_ids`` may be given inline; at query time a record DataFrame
    may be supplied instead (see :func:`apply_subset_filter`).
    """

    filter_type: Literal["subset"] = "subset"
    column: str
    record_ids: list[str] = Field(default_factory=list)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.column).isin(self.record_ids))


class SupplementalMappingFilter(BaseModel):
    """Keep base records having a valid mapping to a supplemental dimension.

    Reference dimension_filters.py:279-308 + dsgrid/project.py:219-240:
    translate supplemental record ids to base ids through the mapping
    table, then semi-join.
    """

    filter_type: Literal["supplemental"] = "supplemental"
    column: str
    supplemental_ids: list[str] = Field(default_factory=list)
    #: registered mapping-table name; lets the query submitter resolve the
    #: records itself (translate-supplemental-to-base, project.py:219-240)
    mapping: str | None = None

    def apply_with_mapping(self, df: DataFrame, mapping_records: DataFrame) -> DataFrame:
        keys = mapping_records.filter(F.col("to_id").isin(self.supplemental_ids))
        keys = keys.select(F.col("from_id").alias("__k")).distinct()
        return df.join(
            F.broadcast(keys), df[self.column] == F.col("__k"), "left_semi"
        )


class NamedDimensionFilter(BaseModel):
    """Filter by a subset or supplemental dimension NAME — the project
    config resolves the record ids / mapping join (reference
    dsgrid/project.py:205-250). The query never names a mapping table.

    - subset dimension: keep base records in the subset (``record_ids``
      optionally restricts further);
    - supplemental dimension: translate ``record_ids`` (supplemental ids)
      to base ids through the project's base→supplemental mapping, then
      semi-join.

    Requires a QuerySubmitter constructed with a ProjectConfig.
    """

    filter_type: Literal["named_dimension"] = "named_dimension"
    dimension_name: str
    record_ids: list[str] = Field(default_factory=list)


DimensionFilter = Union[
    ExpressionFilter, RawExpressionFilter, ColumnOperatorFilter,
    BetweenFilter, SubsetFilter, SupplementalMappingFilter,
    NamedDimensionFilter,
]


def apply_subset_filter(df: DataFrame, column: str, records: DataFrame,
                        id_column: str = "id",
                        broadcast: bool | None = None) -> DataFrame:
    """Semi-join form of SubsetFilter for record tables too big to inline.

    ``broadcast`` follows the flag_outliers / TwoTableHandler three-state
    contract: True forces the hint (subset record lists are usually
    tiny), False forbids it, None (default) lets the planner + AQE
    measure — the sf100 rehearsal showed a forced broadcast of a
    fact-sized right side OOMs the driver (q04 class).
    """
    keys = records.select(F.col(id_column).alias("__k")).distinct()
    if broadcast:
        keys = F.broadcast(keys)
    return df.join(keys, df[column] == F.col("__k"), "left_semi")


def apply_anti_join(df: DataFrame, missing: DataFrame,
                    columns: list[str] | None = None,
                    broadcast: bool | None = None) -> DataFrame:
    """Remove expected-missing dimension associations.

    Reference dsgrid/utils/dataset.py:797-817 (SQL ANTI JOIN).

    The reference's expected-missing lists are small (hand-curated
    association gaps), but the operator is also used with fact-sized
    right sides (q04: every customer with an order). A forced broadcast
    of the latter collected 150M keys into the driver at the sf100
    rehearsal — so ``broadcast`` defaults to None (planner + AQE decide;
    small sides still static-broadcast via the size estimate) with the
    usual force/forbid overrides.
    """
    columns = columns or missing.columns
    right = missing.select(*columns)
    if broadcast:
        right = F.broadcast(right)
    return df.join(right, columns, "left_anti")


def assert_no_nulls(df: DataFrame, exclude: list[str] | None = None) -> None:
    """Fail if any non-excluded column contains NULL.

    Reference dsgrid/utils/spark.py:436-470. One pass; short-circuits via
    limit(1).
    """
    exclude = set(exclude or [])
    cols = [c for c in df.columns if c not in exclude]
    if not cols:
        return
    cond = None
    for c in cols:
        expr = F.col(c).isNull()
        cond = expr if cond is None else (cond | expr)
    bad = df.filter(cond).limit(1).collect()
    if bad:
        raise ValueError(f"NULL values found in columns {cols}: {bad[0].asDict()}")
