"""Physical-plan regression tests: scale properties as assertions.

Correctness tests say the operators compute the right rows; these say
Catalyst produced the plan shape that survives a 100 TB scale-up —
broadcast joins for dimension/mapping tables (the fact table must never
shuffle for mapping), predicate/projection pushdown into parquet scans,
and WindowGroupLimit for per-group argmax.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.operators.mapping import apply_fraction, map_stacked_dimension
from dsgrid_spark.operators.reports import peak_load


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


@pytest.fixture()
def fact_parquet(spark, tmp_path):
    path = tmp_path / "fact.parquet"
    spark.createDataFrame(
        [(f"c{i % 7}", f"m{i % 3}", float(i)) for i in range(1000)],
        "geography string, metric string, value double",
    ).write.parquet(str(path))
    return spark.read.parquet(str(path))


def test_mapping_join_broadcasts(spark, fact_parquet):
    records = spark.createDataFrame(
        [(f"c{i}", "CA", 1.0) for i in range(7)],
        "from_id string, to_id string, from_fraction double",
    )
    out = apply_fraction(map_stacked_dimension(fact_parquet, records, "geography"))
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # the fact side must not be exchanged before the join (only the
    # broadcast side and the final aggregation may exchange)
    assert "SortMergeJoin" not in plan


def test_filter_and_projection_pushed_to_scan(spark, fact_parquet):
    out = fact_parquet.filter(F.col("value") > 10).select("geography", "value")
    plan = _plan(out)
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,10.0)" in plan
    # column pruning: metric must not be read
    assert "metric" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_peak_load_uses_window_group_limit(spark, fact_parquet):
    out = peak_load(fact_parquet, ["geography"], value_column="value")
    plan = _plan(out)
    # Spark 3.5+/4.x rewrites rank<=k filters into WindowGroupLimit,
    # which prunes per-partition before the shuffle
    assert "WindowGroupLimit" in plan


def test_whole_stage_codegen_covers_scalar_path(spark, fact_parquet):
    out = fact_parquet.withColumn("v2", F.col("value") * 2 + 1).filter(
        F.col("v2") > 5
    )
    # '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert "*(1)" in out._jdf.queryExecution().executedPlan().toString()
