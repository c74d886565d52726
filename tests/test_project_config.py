"""Project config: base/subset/supplemental categories + name resolution.

Reference dsgrid/project.py:205-250 (supplemental→base translation) and
project_config.py subset selectors: queries name dimensions, never
mapping tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.operators.aggregation import AggregationModel, ColumnModel
from dsgrid_spark.operators.filters import NamedDimensionFilter
from dsgrid_spark.query.models import DatasetModel, ProjectQueryModel, ResultModel
from dsgrid_spark.query.project import (
    ProjectConfig,
    SubsetDimensionModel,
    SupplementalDimensionModel,
)
from dsgrid_spark.query.submitter import QuerySubmitter
from dsgrid_spark.registry.store import RegistryStore
from dsgrid_spark.sources.catalog import Catalog


@pytest.fixture()
def project():
    return ProjectConfig(
        project_id="demo",
        base_dimensions={"geography": "county"},
        subset_dimensions=[SubsetDimensionModel(
            name="california_counties", dimension_type="geography",
            record_ids=["06037", "06073"])],
        supplemental_dimensions=[SupplementalDimensionModel(
            name="state", dimension_type="geography",
            mapping="county_to_state")],
    )


@pytest.fixture()
def cat(spark):
    c = Catalog(spark)
    fact = spark.createDataFrame(
        [("06037", 1.0), ("06073", 2.0), ("08031", 4.0), ("08001", 8.0)],
        "geography string, value double",
    )
    c.register_dataset("load", fact)
    c.register_mapping("county_to_state", spark.createDataFrame(
        [("06037", "CA", 1.0), ("06073", "CA", 1.0),
         ("08031", "CO", 1.0), ("08001", "CO", 1.0)],
        "from_id string, to_id string, from_fraction double"),
        from_dimension="county", to_dimension="state")
    return c


def _submit(cat, project, **kw):
    q = ProjectQueryModel(name="p", source_datasets=[DatasetModel(dataset_id="load")], **kw)
    return QuerySubmitter(cat, project=project).submit(q)


def test_subset_filter_by_name(cat, project):
    out = _submit(cat, project, result=ResultModel(filters=[
        NamedDimensionFilter(dimension_name="california_counties")]))
    assert sorted(r["geography"] for r in out.collect()) == ["06037", "06073"]


def test_subset_filter_name_restricted(cat, project):
    out = _submit(cat, project, result=ResultModel(filters=[
        NamedDimensionFilter(dimension_name="california_counties",
                             record_ids=["06073"])]))
    assert [r["geography"] for r in out.collect()] == ["06073"]


def test_supplemental_filter_by_name(cat, project):
    """Supplemental ids translate to base ids through the project's
    mapping — the query never names the mapping table."""
    out = _submit(cat, project, result=ResultModel(filters=[
        NamedDimensionFilter(dimension_name="state", record_ids=["CO"])]))
    assert sorted(r["geography"] for r in out.collect()) == ["08001", "08031"]


def test_aggregate_by_supplemental_name(cat, project):
    """Grouping by a supplemental dimension name maps base→supplemental
    automatically (with fraction weighting) before the aggregation."""
    out = _submit(cat, project, result=ResultModel(aggregations=[
        AggregationModel(group_by_columns=[ColumnModel(dimension_name="state")],
                         aggregation_function="sum")]))
    got = {r["state"]: r["value"] for r in out.collect()}
    assert got == {"CA": 3.0, "CO": 12.0}


def test_weighted_supplemental_aggregation(spark, project):
    """Fractional base→supplemental weights fold into the value."""
    c = Catalog(spark)
    c.register_dataset("load", spark.createDataFrame(
        [("06037", 10.0)], "geography string, value double"))
    c.register_mapping("county_to_state", spark.createDataFrame(
        [("06037", "CA", 0.25), ("06037", "NV", 0.75)],
        "from_id string, to_id string, from_fraction double"))
    out = _submit(c, project, result=ResultModel(aggregations=[
        AggregationModel(group_by_columns=[ColumnModel(dimension_name="state")],
                         aggregation_function="sum")]))
    got = {r["state"]: r["value"] for r in out.collect()}
    assert got == {"CA": 2.5, "NV": 7.5}


def test_unknown_name_and_missing_project(cat, project):
    with pytest.raises(ValueError, match="not a subset or supplemental"):
        _submit(cat, project, result=ResultModel(filters=[
            NamedDimensionFilter(dimension_name="nope")]))
    with pytest.raises(ValueError, match="requires a ProjectConfig"):
        _submit(cat, None, result=ResultModel(filters=[
            NamedDimensionFilter(dimension_name="state")]))


def test_project_registry_roundtrip(spark, project, tmp_path):
    store = RegistryStore(tmp_path / "reg", spark)
    assert store.register_project(project) == "1.0.0"
    again = RegistryStore(tmp_path / "reg", spark).load_project("demo")
    assert again == project
    assert again.dimension_names("subset") == ["california_counties"]
    assert again.dimension_names("supplemental") == ["state"]
    v2 = store.update_project(project.model_copy(update={
        "subset_dimensions": []}))
    assert v2 == "2.0.0"
    assert store.load_project("demo").subset_dimensions == []
    assert store.load_project("demo", version="1.0.0") == project


def test_multi_stage_supplemental_resolves_per_stage(spark, project):
    """Stage 1 groups by the BASE column; stage 2 by the supplemental
    name. Resolution must happen immediately before each stage — an
    up-front pass would rename the base column away and break stage 1."""
    c = Catalog(spark)
    fact = spark.createDataFrame(
        [("06037", "res", 1.0), ("06037", "com", 2.0),
         ("06073", "res", 4.0), ("08031", "res", 8.0)],
        "geography string, sector string, value double",
    )
    c.register_dataset("load", fact)
    c.register_mapping("county_to_state", spark.createDataFrame(
        [("06037", "CA", 1.0), ("06073", "CA", 1.0), ("08031", "CO", 1.0)],
        "from_id string, to_id string, from_fraction double"),
        from_dimension="county", to_dimension="state")
    q = ProjectQueryModel(
        name="two_stage", source_datasets=[DatasetModel(dataset_id="load")],
        result=ResultModel(aggregations=[
            AggregationModel(
                group_by_columns=[ColumnModel(dimension_name="geography")],
                aggregation_function="sum"),
            AggregationModel(
                group_by_columns=[ColumnModel(dimension_name="state")],
                aggregation_function="sum"),
        ]),
    )
    out = QuerySubmitter(c, project=project).submit(q)
    got = {r["state"]: r["value"] for r in out.collect()}
    assert got == {"CA": 7.0, "CO": 8.0}


def test_supplemental_nonsum_aggregation_collapses_fraction(spark, project):
    """avg over a fractional disaggregation mapping must NOT simply fold
    the fraction into the value; the mapping is collapsed with a weighted
    sum first, then avg runs on properly re-expressed values."""
    c = Catalog(spark)
    fact = spark.createDataFrame(
        [("06037", "a", 10.0), ("06037", "b", 20.0), ("06073", "a", 40.0)],
        "geography string, tag string, value double",
    )
    c.register_dataset("load", fact)
    # 50/50 disaggregation of each county into two zones
    c.register_mapping("county_to_state", spark.createDataFrame(
        [("06037", "Z1", 0.5), ("06037", "Z2", 0.5),
         ("06073", "Z1", 0.5), ("06073", "Z2", 0.5)],
        "from_id string, to_id string, from_fraction double"),
        from_dimension="county", to_dimension="zone")
    q = ProjectQueryModel(
        name="avg_disagg", source_datasets=[DatasetModel(dataset_id="load")],
        result=ResultModel(aggregations=[AggregationModel(
            group_by_columns=[ColumnModel(dimension_name="state")],
            aggregation_function="avg")]),
    )
    out = QuerySubmitter(c, project=project).submit(q)
    got = {r["state"]: r["value"] for r in out.collect()}
    # per (zone, tag) weighted sums: Z1/a = 10*.5+40*.5 = 25, Z1/b = 10,
    # so avg(Z1) = mean(25, 10) = 17.5; same for Z2
    assert got == {"Z1": 17.5, "Z2": 17.5}
