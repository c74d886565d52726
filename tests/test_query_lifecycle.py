"""End-to-end query lifecycle: handlers, catalog, submitter, caching.

Mirrors the reference's pattern of running each query cold and from cache
and requiring identical results (tests/test_queries.py:663-670).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.datasets.handlers import DatasetConfig, OneTableHandler, TwoTableHandler
from dsgrid_spark.operators.aggregation import AggregationModel, ColumnModel
from dsgrid_spark.operators.filters import ExpressionFilter
from dsgrid_spark.query.models import (
    DatasetModel,
    MappingSpec,
    PivotedResultFormat,
    ProjectQueryModel,
    ProjectionDatasetModel,
    ResultModel,
)
from dsgrid_spark.query.submitter import QuerySubmitter
from dsgrid_spark.sources.catalog import Catalog


@pytest.fixture()
def catalog(spark, load_onetable, county_to_state, geography_records, metric_records):
    cat = Catalog(spark)
    cat.register_dataset("load", load_onetable)
    cat.register_mapping("county_to_state", county_to_state,
                         from_dimension="county", to_dimension="state")
    cat.register_dimension("geography", geography_records)
    cat.register_dimension("metric", metric_records)
    return cat


def _query(**result_kwargs):
    return ProjectQueryModel(
        name="q",
        source_datasets=[DatasetModel(
            dataset_id="load",
            mappings=[MappingSpec(dimension="geography", mapping="county_to_state")],
            filters=[ExpressionFilter(column="scenario", operator="==",
                                      value="reference")],
        )],
        result=ResultModel(
            aggregations=[AggregationModel(
                group_by_columns=[ColumnModel(dimension_name="geography"),
                                  ColumnModel(dimension_name="metric")],
                aggregation_function="sum")],
            **result_kwargs,
        ),
    )


def test_submit_against_python_golden(catalog, expected_rows):
    from collections import defaultdict

    from .conftest import COUNTIES

    res = QuerySubmitter(catalog).submit(_query())
    got = {(r["geography"], r["metric"]): r["value"] for r in res.collect()}
    state_of = {c[0]: c[2] for c in COUNTIES}
    exp = defaultdict(float)
    for row in expected_rows:
        if row[7] == "reference":
            exp[(state_of[row[1]], row[2])] += row[8]
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)


def test_submit_pivoted_result(catalog):
    q = _query(output_format="pivoted",
               pivoted=PivotedResultFormat(
                   pivoted_dimension="metric",
                   pivot_values=["electricity_cooling", "electricity_heating",
                                 "natural_gas_heating"]))
    res = QuerySubmitter(catalog).submit(q)
    assert set(res.columns) == {"geography", "electricity_cooling",
                                "electricity_heating", "natural_gas_heating"}


def test_cache_cold_then_warm(catalog, tmp_path):
    sub = QuerySubmitter(catalog, output_dir=tmp_path)
    q = _query()
    cold = sub.submit(q)
    cold_rows = sorted(map(tuple, cold.collect()))
    assert (tmp_path / "cache").exists()
    warm = sub.submit(q)
    assert sorted(map(tuple, warm.collect())) == cold_rows
    # metadata sidecar written
    assert (tmp_path / "q.metadata.json").exists()


def test_projection_dataset_in_query(spark, catalog):
    initial = spark.createDataFrame(
        [("2018", "CA", 100.0), ("2018", "CO", 10.0)],
        "model_year string, geography string, value double",
    )
    rates = spark.createDataFrame(
        [("2030", "CA", 0.05), ("2030", "CO", 0.05)],
        "model_year string, geography string, value double",
    )
    catalog.register_dataset("initial", initial)
    catalog.register_dataset("rates", rates)
    q = ProjectQueryModel(
        name="proj",
        source_datasets=[ProjectionDatasetModel(
            dataset_id="projected",
            initial_value_dataset="initial",
            growth_rate_dataset="rates",
            construction_method="exponential_growth",
            base_year="2018",
        )],
    )
    res = QuerySubmitter(catalog).submit(q)
    got = {r["geography"]: r["value"] for r in res.collect()}
    assert got["CA"] == pytest.approx(100.0 * 1.05 ** 12)


def test_one_table_handler_trivial_and_check(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 1, 1), "06037", 1.0)],
        "timestamp timestamp, geography string, value double",
    )
    h = OneTableHandler(df, DatasetConfig(
        dataset_id="d", trivial_dimensions={"scenario": "base", "model_year": "2018"}
    ))
    assert set(h.df.columns) == {"timestamp", "geography", "value", "scenario",
                                 "model_year"}
    h.check_columns({"timestamp", "geography", "value", "scenario", "model_year"})
    with pytest.raises(ValueError):
        h.check_columns({"timestamp", "value"})


def test_one_table_handler_casts_int_dims(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2018, 1, 1), "06037", 2018, 1.0)],
        "timestamp timestamp, geography string, model_year int, value double",
    )
    h = OneTableHandler(df, DatasetConfig(dataset_id="d"))
    assert dict(h.df.dtypes)["model_year"] == "string"


def test_two_table_handler_consistency(spark):
    load = spark.createDataFrame(
        [(1, dt.datetime(2018, 1, 1), 5.0), (2, dt.datetime(2018, 1, 1), 7.0)],
        "id int, timestamp timestamp, value double",
    )
    lookup = spark.createDataFrame(
        [(1, "06037", 2.0), (2, "08031", None)],
        "id int, geography string, scaling_factor double",
    )
    h = TwoTableHandler(load, lookup, DatasetConfig(dataset_id="tt"))
    h.check_id_consistency()
    got = {r["geography"]: r["value"] for r in h.to_stacked().collect()}
    assert got["06037"] == 10.0  # scaling factor applied
    assert got["08031"] == 7.0   # NULL factor → 1.0
    bad_lookup = spark.createDataFrame(
        [(1, "06037", None)], "id int, geography string, scaling_factor double"
    )
    h2 = TwoTableHandler(load, bad_lookup, DatasetConfig(dataset_id="tt"))
    with pytest.raises(ValueError):
        h2.check_id_consistency()


def test_mapping_path(spark, catalog):
    catalog.register_mapping("state_to_census", spark.createDataFrame(
        [("CA", "west", 1.0)], "from_id string, to_id string, from_fraction double"),
        from_dimension="state", to_dimension="census_region")
    path = catalog.mapping_path("county", "census_region")
    assert path == ["county_to_state", "state_to_census"]
