"""Mapping operator tests — golden values recomputed in plain Python."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.dimensions import DimensionMappingType
from dsgrid_spark.operators.mapping import (
    apply_fraction,
    check_mapping_fractions,
    is_noop_mapping,
    map_and_reduce,
    map_stacked_dimension,
)

from .conftest import COUNTIES


def test_map_county_to_state_sums(load_onetable, county_to_state, expected_rows):
    df = map_stacked_dimension(load_onetable, county_to_state, "geography")
    out = apply_fraction(df)
    got = {
        (r["geography"], r["metric"]): r["value"]
        for r in out.groupBy("geography", "metric")
        .agg(F.sum("value").alias("value"))
        .collect()
    }
    state_of = {c[0]: c[2] for c in COUNTIES}
    exp = defaultdict(float)
    for row in expected_rows:
        exp[(state_of[row[1]], row[2])] += row[8]
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], rel=1e-9)


def test_disaggregation_preserves_total(load_onetable, county_to_state, state_to_county):
    to_state = apply_fraction(
        map_stacked_dimension(load_onetable, county_to_state, "geography")
    )
    back = apply_fraction(
        map_stacked_dimension(to_state, state_to_county, "geography")
    )
    total_before = to_state.agg(F.sum("value")).collect()[0][0]
    total_after = back.agg(F.sum("value")).collect()[0][0]
    assert total_after == pytest.approx(total_before, rel=1e-9)
    # county count restored
    assert back.select("geography").distinct().count() == 4


def test_null_to_id_drops_records(load_onetable, subsector_subset):
    out = apply_fraction(
        map_stacked_dimension(load_onetable, subsector_subset, "subsector")
    )
    kept = {r[0] for r in out.select("subsector").distinct().collect()}
    assert kept == {"office", "sf"}


def test_map_and_reduce_single_aggregation(load_onetable, county_to_state,
                                           subsector_subset):
    out = map_and_reduce(
        load_onetable,
        {"geography": county_to_state, "subsector": subsector_subset},
    )
    # one row per (ts, state, metric, sector, kept-subsector, my, wy, scenario)
    assert out.count() == 48 * 2 * 3 * 2 * 1 * 2 * 2
    # plan check: no more than one shuffle-agg, map joins broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


def test_fraction_validation():
    import dsgrid_spark.session as s

    spark = s.get_spark("t", master="local[2]")
    bad = spark.createDataFrame(
        [("a", "x", 0.5), ("a", "y", 0.2)],
        "from_id string, to_id string, from_fraction double",
    )
    with pytest.raises(ValueError):
        check_mapping_fractions(bad, DimensionMappingType.ONE_TO_MANY_DISAGGREGATION)
    ok = spark.createDataFrame(
        [("a", "x", 0.5), ("a", "y", 0.5)],
        "from_id string, to_id string, from_fraction double",
    )
    check_mapping_fractions(ok, DimensionMappingType.ONE_TO_MANY_DISAGGREGATION)
    with pytest.raises(ValueError):
        check_mapping_fractions(bad, DimensionMappingType.MANY_TO_ONE_AGGREGATION)


def test_noop_mapping_detection(spark):
    noop = spark.createDataFrame(
        [("a", "a", 1.0), ("b", "b", 1.0)],
        "from_id string, to_id string, from_fraction double",
    )
    assert is_noop_mapping(noop)
    rename = spark.createDataFrame(
        [("a", "A", 1.0)], "from_id string, to_id string, from_fraction double"
    )
    assert not is_noop_mapping(rename)


def test_fraction_validation_archetypes(spark):
    """Archetype rules (reference dimension_mapping_base.py:43-130):
    many_to_many_aggregation sums to 1 per from_id (fractional weights
    valid); assignment types sum to 1 per to_id."""
    halves = spark.createDataFrame(
        [("a", "x", 0.5), ("a", "y", 0.5), ("b", "x", 1.0)],
        "from_id string, to_id string, from_fraction double",
    )
    check_mapping_fractions(halves, DimensionMappingType.MANY_TO_MANY_AGGREGATION)
    check_mapping_fractions(halves, DimensionMappingType.ONE_TO_ONE)
    bad = spark.createDataFrame(
        [("a", "x", 0.5), ("a", "y", 0.2)],
        "from_id string, to_id string, from_fraction double",
    )
    with pytest.raises(ValueError):
        check_mapping_fractions(bad, DimensionMappingType.MANY_TO_MANY_AGGREGATION)
    # assignment: grouped by to_id — halves has to_id x summing to 1.5
    to_ok = spark.createDataFrame(
        [("a", "x", 0.6), ("b", "x", 0.4), ("c", "y", 1.0)],
        "from_id string, to_id string, from_fraction double",
    )
    check_mapping_fractions(to_ok, DimensionMappingType.MANY_TO_ONE_ASSIGNMENT)
    with pytest.raises(ValueError):
        check_mapping_fractions(halves, DimensionMappingType.MANY_TO_ONE_ASSIGNMENT)


def test_salt_partitions_salts_input_not_fanout(load_onetable, county_to_state,
                                                state_to_county):
    """salt_partitions must round-robin the INPUT before the broadcast
    fan-out join — never repartition the fanned-out output, which would
    shuffle fan-times the rows and defeat map-side partial aggregation
    (measured 18x slower at fan=1000; tools/skew_rehearsal.py, SKEW.md).

    Checks (1) result invariance vs the unsalted path and (2) the plan:
    the RoundRobin exchange sits below the BroadcastHashJoin, and no
    exchange sits between the join and the partial aggregation.
    """
    # aggregate counties -> states first, then DISAGGREGATE back to
    # counties: the second map is the ONE_TO_MANY fan-out being salted
    to_state = map_stacked_dimension(load_onetable, county_to_state, "geography")

    plain = apply_fraction(
        map_stacked_dimension(to_state, state_to_county, "geography")
    )
    salted_df = map_stacked_dimension(
        to_state, state_to_county, "geography", salt_partitions=8
    )
    salted = apply_fraction(salted_df)

    a = {tuple(sorted(r.asDict().items())) for r in plain.collect()}
    b = {tuple(sorted(r.asDict().items())) for r in salted.collect()}
    assert a == b
    assert len(a) > 0  # the fan-out actually produced rows

    plan = salted._jdf.queryExecution().executedPlan().toString()
    rr = plan.find("RoundRobinPartitioning")
    bj = plan.find("BroadcastHashJoin")
    agg_partial = plan.find("partial_sum")
    assert rr != -1 and bj != -1 and agg_partial != -1
    # executed-plan strings print top-down: the partial aggregate
    # consumes the join, which consumes the round-robin exchange — so
    # the exchange must appear BELOW (after) the join line, and the join
    # below the partial aggregate
    assert agg_partial < bj < rr
    # and no exchange may sit between the partial aggregate and the join
    # — a shuffle there (the old post-fan-out salting) would re-defeat
    # map-side partial aggregation
    assert "Exchange" not in plan[agg_partial:bj]
