"""Public query API models (JSON5/JSON-compatible pydantic).

Mirrors the reference's ProjectQueryModel surface
(dsgrid/query/models.py:598-611, result params :426-524) — same concepts,
same JSON field names where sensible, so a dsgrid user's queries translate
mechanically.
"""

from __future__ import annotations

from typing import Literal, Optional, Union

from pydantic import BaseModel, Field

from dsgrid_spark.operators.aggregation import AggregationModel
from dsgrid_spark.operators.filters import (
    BetweenFilter, ColumnOperatorFilter, ExpressionFilter,
    NamedDimensionFilter, RawExpressionFilter, SubsetFilter,
    SupplementalMappingFilter,
)

FilterModel = Union[
    ExpressionFilter, RawExpressionFilter, ColumnOperatorFilter,
    BetweenFilter, SubsetFilter, SupplementalMappingFilter,
    NamedDimensionFilter,
]


class MappingSpec(BaseModel):
    """One dimension-map step of a dataset's plan.

    ``mapping`` names a registered mapping table
    (reference DatasetMappingPlan, dsgrid/query/dataset_mapping_plan.py:64-120);
    order matters for intermediate sizes, so it stays user-visible.
    """

    dimension: str
    mapping: str
    salt_partitions: Optional[int] = None  # skew escape hatch


class DatasetModel(BaseModel):
    dataset_id: str
    mappings: list[MappingSpec] = Field(default_factory=list)
    filters: list[FilterModel] = Field(default_factory=list)
    #: runtime-settable Spark confs scoped around this dataset's map phase
    #: (reference spark_conf_per_dataset, models.py:284-288 — the reference
    #: restarts the session; we scope the live one). Takes effect at
    #: execution, so it pairs with the dataset-level cache materialization.
    spark_conf: dict[str, str] = Field(default_factory=dict)


class ProjectionDatasetModel(BaseModel):
    """Growth-rate projection dataset (reference models.py standalone
    datasets with construction_method exponential_growth/annual_multiplier)."""

    dataset_id: str
    initial_value_dataset: str
    growth_rate_dataset: str
    construction_method: Literal["exponential_growth", "annual_multiplier"]
    base_year: Optional[str] = None
    mappings: list[MappingSpec] = Field(default_factory=list)
    filters: list[FilterModel] = Field(default_factory=list)


class PivotedResultFormat(BaseModel):
    format_type: Literal["pivoted"] = "pivoted"
    pivoted_dimension: str
    pivot_values: Optional[list[str]] = None


class PeakLoadReportModel(BaseModel):
    """Peak-load report as a result-phase step (reference
    ReportInputModel, models.py:489-499 + report_peak_load.py:36-70):
    keep the per-group argmax row(s) of the result table."""

    report_type: Literal["peak_load"] = "peak_load"
    group_by_columns: list[str]
    value_column: str = "value"
    #: deterministic argmax; empty = keep all ties (reference join-back)
    tie_breakers: list[str] = Field(default_factory=list)


class ResultModel(BaseModel):
    """Result-phase params (reference models.py:426-524)."""

    filters: list[FilterModel] = Field(default_factory=list)
    aggregations: list[AggregationModel] = Field(default_factory=list)
    #: post-aggregation reports (reference `reports`)
    reports: list[PeakLoadReportModel] = Field(default_factory=list)
    sort_columns: list[str] = Field(default_factory=list)
    replace_ids_with_names: bool = False
    output_format: Literal["stacked", "pivoted"] = "stacked"
    pivoted: Optional[PivotedResultFormat] = None
    #: an IANA zone name, or the literal "geography" to convert each row
    #: through its geography's zone from the registered geography
    #: dimension records (reference time_zone: str | Literal["geography"])
    time_zone: Optional[str] = None
    #: final column renames — the reference's column naming modes
    #: (dimension-type vs dimension-query names, models.py:104-109)
    column_names: dict[str, str] = Field(default_factory=dict)


class ProjectQueryModel(BaseModel):
    """Top-level query (reference models.py:598-611)."""

    name: str
    source_datasets: list[Union[DatasetModel, ProjectionDatasetModel]]
    expression: Optional[str] = None  # default: union of all datasets
    #: apply ``result.aggregations`` to every mapped dataset before
    #: combining — shrinks each dataset ahead of the union/arithmetic join
    #: (reference aggregate_each_dataset, query_submitter.py:502-525)
    aggregate_each_dataset: bool = False
    result: ResultModel = Field(default_factory=ResultModel)
