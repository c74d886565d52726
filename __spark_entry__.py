"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
through the dsgrid_spark engine; ``oracle_sql()`` holds the equivalent
ANSI SQL for the DuckDB oracle. Column names/aliases match exactly on
both sides; float aggregates are rounded identically on both sides to
absorb summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsgrid_spark.operators.aggregation import AggregationModel, ColumnModel
from dsgrid_spark.operators.expressions import evaluate_expression
from dsgrid_spark.operators.filters import (
    BetweenFilter,
    ColumnOperatorFilter,
    ExpressionFilter,
    apply_anti_join,
    apply_subset_filter,
)
from dsgrid_spark.operators.growth import apply_exponential_growth
from dsgrid_spark.operators.mapping import (
    apply_fraction,
    map_stacked_dimension,
)
from dsgrid_spark.operators.reports import peak_load, top_k_per_group
from dsgrid_spark.operators.reshape import pivot, unpivot
from dsgrid_spark.operators.units import convert_units
from dsgrid_spark.datasets.handlers import DatasetConfig, TwoTableHandler
from dsgrid_spark.pipeline.dedup import exact_dedup, minhash_dedup, simhash_dedup
from dsgrid_spark.pipeline.multimodal import extract_image_features
from dsgrid_spark.pipeline.similarity import brute_force_topk, lsh_topk
from dsgrid_spark.pipeline.text import bpe_ish_token_count, token_count
from dsgrid_spark.sources.tables import load_table, prep_session
from dsgrid_spark.timedim.annual import annual_to_hourly
from dsgrid_spark.timedim.conversion import (
    convert_time_zone,
    convert_time_zone_by_geography,
    downsample,
)

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_DUCK_TS = "%Y-%m-%d %H:%M:%S"
_DUCK_TS_US = "%Y-%m-%d %H:%M:%S.%f"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _table_bytes(sf_dir: str, name: str) -> int:
    """On-disk size of a table (file or directory of part files) via
    os.stat only — a widen-decision input that costs no Spark job."""
    import os

    p = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(p):
        return sum(
            os.path.getsize(os.path.join(p, f)) for f in os.listdir(p)
            if not f.startswith(("_", ".")))
    return os.path.getsize(p) if os.path.exists(p) else 0


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship dsgrid-style query at sf0.001: map the customer's nation
    through a weighted mapping table to its region (broadcast map-join +
    fraction collapse), join orders, aggregate revenue per region/year."""
    sf_dir = "/root/testdata/sf0.001"
    prep_session(spark)
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    mapping = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").cast("string").alias("from_id"),
        F.col("r_name").alias("to_id"),
        F.lit(1.0).alias("from_fraction"),
    )
    fact = customer.join(orders, customer.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("string").alias("geography"),
        F.year("o_orderdate").alias("order_year"),
        F.col("o_totalprice").alias("value"),
    )
    mapped = apply_fraction(map_stacked_dimension(fact, mapping, "geography"))
    return (
        mapped.groupBy("geography", "order_year")
        .agg(F.round(F.sum("value"), 2).alias("revenue"))
        .orderBy("geography", "order_year")
    )


# --------------------------------------------------------------------------
# queries: one per operator family
# --------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    """Hash aggregation with multiple agg functions (SURVEY §2.4)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        # quantities are integer-valued doubles: their float sum is exact
        # and order-independent, no discretization needed
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        # 2-decimal money is NOT exactly representable: discretize per ROW
        # (identical IEEE on both engines) and sum exact integer cents, so
        # the value is independent of partial-sum merge order (the q21
        # sf1 lesson — round(sum(float), 2) coin-flips on .005 boundaries)
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long"))
        .alias("sum_base_price_cents"),
        # floor micro-units, not round(avg, 6): cross-engine round()
        # algorithms differ on identical inputs (the q29/q39 lesson)
        F.floor(F.avg("l_discount") * 1e6 + 0.5).cast("long").alias("avg_disc_micro"),
        F.count("*").alias("count_order"),
    )


def q02_scan_projection(spark, sf_dir):
    """Parquet scan + pushed filter + projection (SURVEY §2.1/2.2), where
    the projection is the text-cleaning pipeline op: URL/email scrub +
    whitespace collapse with RE2-compatible regexes an external engine can
    reproduce. URLs/emails are injected deterministically so the scrub is
    actually exercised."""
    from dsgrid_spark.pipeline.text import (
        _EMAIL_RE, _URL_RE, clean_text, count_pattern,
    )

    from dsgrid_spark.pipeline.text import redact_pii

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    # URL host varies per doc (sub{d%5}.site{d%7}.com) so the domain
    # extraction below has real work; the oracle checks it INDEPENDENTLY
    # from doc_id arithmetic, never by parsing the URL
    docs = docs.withColumn(
        "text",
        F.concat("text", F.lit(" see https://sub"),
                 (F.col("doc_id") % 5).cast("string"), F.lit(".site"),
                 (F.col("doc_id") % 7).cast("string"), F.lit(".com/d/"),
                 F.col("doc_id").cast("string"),
                 F.lit(" or mail user"), F.col("doc_id").cast("string"),
                 F.lit("@test.org now ip 10.0."),
                 (F.col("doc_id") % 256).cast("string"),
                 F.lit(".7 call +1555"), F.col("doc_id").cast("string"),
                 F.lit(" card 4111111111111111 ok")),
    )
    from dsgrid_spark.pipeline.text import flag_blocked_domains, registered_domains

    docs = flag_blocked_domains(docs, ["site0.com", "site3.com"])
    return docs.select(
        "doc_id",
        count_pattern(F.col("text"), _URL_RE).cast("long").alias("n_urls"),
        count_pattern(F.col("text"), _EMAIL_RE).cast("long").alias("n_emails"),
        F.length(clean_text(F.col("text"))).cast("long").alias("n_chars_clean"),
        F.length(redact_pii(F.col("text"))).cast("long").alias("n_chars_redacted"),
        F.element_at(registered_domains(F.col("text")), 1).alias("domain"),
        F.col("blocked"),
    )


def q03_filter_ops(spark, sf_dir):
    """Column-operator / between / negated / raw-expression filters
    (SURVEY §2.2)."""
    from dsgrid_spark.operators.filters import RawExpressionFilter

    part = _t(spark, sf_dir, "part")
    part = ColumnOperatorFilter(column="p_type", operator="startswith",
                                value="PROMO").apply(part)
    part = BetweenFilter(column="p_size", lower=1, upper=15).apply(part)
    part = ColumnOperatorFilter(column="p_brand", operator="isin",
                                value=["Brand#45"], negate=True).apply(part)
    part = RawExpressionFilter(expression="p_retailprice < 960.0").apply(part)
    return part.select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


def q04_filter_subset(spark, sf_dir):
    """Subset-dimension semi-join filter + anti join (SURVEY §2.2/§2.3),
    tagged union: 'subset' = lineitem restricted to small parts; 'anti' =
    customers with no orders (empty on this generator, still exercised)."""
    li = _t(spark, sf_dir, "lineitem")
    small_parts = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    subset = apply_subset_filter(li, "l_partkey", small_parts, "p_partkey")
    subset = subset.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ).select(F.lit("subset").alias("mode"), "grp", "n_rows", "sum_qty")

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    anti = apply_anti_join(cust, orders, ["c_custkey"])
    anti = anti.groupBy(F.col("c_mktsegment").alias("grp")).agg(
        F.count("*").alias("n_rows")
    ).select(F.lit("anti").alias("mode"), "grp", "n_rows",
             F.lit(0.0).alias("sum_qty"))
    return subset.unionByName(anti)


def q06_join_multi(spark, sf_dir, branch=None):
    """Tagged union of join families (SURVEY §2.3 + temporal joins):
    'multi' = multi-table equi-join chain; 'asof' = backward as-of join
    of events to a weekly-changing per-user rate table (union+window
    carry-forward, one shuffle); 'range' = bucket-binned interval join
    of events into 6h maintenance windows (no nested-loop plan).

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named branch's plan — the q30/q32 per-branch-plan
    convention (r12): the tag-filter fallback prunes the sibling
    branches' EXECUTION but the timing still pays the whole union's
    construction + Catalyst analysis. branch='asof' returns the
    backward AND forward as-of children, matching the tag filter's
    startswith('asof') scope, so the timed work is identical."""
    from dsgrid_spark.operators.temporal_joins import asof_join, range_join

    if branch in (None, "multi"):
        cust = _t(spark, sf_dir, "customer")
        nation = _t(spark, sf_dir, "nation")
        region = _t(spark, sf_dir, "region")
        multi = (
            cust.join(nation, cust.c_nationkey == nation.n_nationkey)
            .join(region, nation.n_regionkey == region.r_regionkey)
            .groupBy(F.col("r_name").alias("k"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("c_acctbal"), 2).alias("value"),
            )
            .select(F.lit("multi").alias("op"), "k", "n", "value")
        )
        if branch == "multi":
            return multi

    ev = _t(spark, sf_dir, "events")
    base = F.unix_timestamp(F.to_timestamp(F.lit("2024-01-01")))
    if branch in (None, "asof"):
        # deterministic weekly rate schedule per user (same literal recipe
        # as the oracle SQL)
        rates = (
            ev.select("user_id").distinct()
            .select("user_id",
                    F.explode(F.sequence(F.lit(0), F.lit(4))).alias("k"))
            .select(
                "user_id",
                F.timestamp_seconds(base + F.col("k") * 604800)
                .alias("valid_from"),
                (((F.col("user_id") * 7 + F.col("k")) % 100) / 10.0)
                .alias("rate"),
            )
        )
        asof = (
            asof_join(ev.select("user_id", "ts", "value"), rates,
                      ["user_id"], "ts", "valid_from", ["rate"])
            .groupBy("user_id")
            # floor micro-units as double (column shared with the round-2
            # 'multi' branch): identical IEEE ops on both engines, immune to
            # the round-algorithm mismatch (q39 lesson)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.floor(F.sum(F.col("value") * F.col("rate")) * 1e6 + 0.5)
                 .cast("double").alias("value"))
            .select(F.lit("asof").alias("op"),
                    F.col("user_id").cast("string").alias("k"), "n", "value")
        )

        fwd = (
            asof_join(ev.select("user_id", "ts", "value"), rates,
                      ["user_id"], "ts", "valid_from", ["rate"],
                      direction="forward")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.floor(F.sum(F.col("value") * F.col("rate")) * 1e6 + 0.5)
                 .cast("double").alias("value"))
            .select(F.lit("asof_fwd").alias("op"),
                    F.col("user_id").cast("string").alias("k"), "n", "value")
        )
        if branch == "asof":
            return asof.unionByName(fwd)

    windows = spark.range(10).select(
        F.col("id").alias("window_id"),
        F.timestamp_seconds(base + F.col("id") * 3 * 86400).alias("w_start"),
        F.timestamp_seconds(base + F.col("id") * 3 * 86400 + 21600).alias("w_end"),
    )
    rng = (
        range_join(ev.select("ts", "value"), windows, "ts",
                   "w_start", "w_end", bucket_seconds=21600)
        .groupBy("window_id")
        # per-row micro-units summed as exact integers (q21 determinism rule)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.floor(F.col("value") * 1e6 + 0.5).cast("long"))
             .cast("double").alias("value"))
        .select(F.lit("range").alias("op"),
                F.col("window_id").cast("string").alias("k"), "n", "value")
    )
    if branch == "range":
        return rng
    return multi.unionByName(asof).unionByName(fwd).unionByName(rng)


def q07_map_dimension(spark, sf_dir, branch=None):
    """map_stacked_dimension + apply_fraction — the dsgrid workhorse —
    in both directions (SURVEY §2.3): 'agg' = ONE_TO_ONE rename/aggregate;
    'disagg' = weighted ONE_TO_MANY disaggregation with fractions summing
    to 1 per from_id (§4 skew case). Tagged union.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named direction's plan — the q30/q32 per-branch-plan
    convention (r12)."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    if branch in (None, "agg"):
        up_mapping = nation.select(
            F.col("n_nationkey").cast("string").alias("from_id"),
            F.col("n_name").alias("to_id"),
            F.lit(1.0).alias("from_fraction"),
        )
        fact = cust.select(
            F.col("c_custkey"),
            F.col("c_nationkey").cast("string").alias("geography"),
            F.col("c_acctbal").alias("value"),
        )
        agg = apply_fraction(
            map_stacked_dimension(fact, up_mapping, "geography"))
        agg = agg.groupBy("geography").agg(
            F.round(F.sum("value"), 2).alias("value")
        ).select(F.lit("agg").alias("mode"), "geography", "value")
        if branch == "agg":
            return agg

    w = Window.partitionBy("n_regionkey")
    down_mapping = nation.select(
        F.col("n_regionkey").cast("string").alias("from_id"),
        F.col("n_name").alias("to_id"),
        (F.lit(1.0) / F.count("*").over(w)).alias("from_fraction"),
    )
    region_totals = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_regionkey").cast("string").alias("geography"))
        .agg(F.sum("c_acctbal").alias("value"))
    )
    disagg = apply_fraction(
        map_stacked_dimension(region_totals, down_mapping, "geography")
    ).select(F.lit("disagg").alias("mode"), "geography",
             F.floor(F.col("value") * 1e6 + 0.5).cast("double").alias("value"))
    if branch == "disagg":
        return disagg
    return agg.unionByName(disagg)


def q09_two_table(spark, sf_dir):
    """Two-table dataset: fact ⋈ lookup on surrogate id (SURVEY §1.1)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("id"),
        F.col("l_shipdate").alias("timestamp"),
        F.col("l_extendedprice").alias("value"),
    )
    lookup = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )
    handler = TwoTableHandler(li, lookup, DatasetConfig(dataset_id="li2t",
                                                        time_columns=["timestamp"]))
    stacked = handler.to_stacked()
    # per-row cents then exact integer sum: the AQE shuffle join's
    # partial-merge order differs from DuckDB's, and round(sum(float), 2)
    # flipped last-cent at the sf10 rehearsal (the q21 lesson)
    return stacked.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long"))
        .alias("sum_value_cents"),
        F.count("*").alias("n_rows"),
    )


def q10_agg_chained(spark, sf_dir):
    """Chained AggregationModels with per-column function transform
    (hour-of-day diurnal pattern, SURVEY §2.4) + count-distinct + exact
    per-group percentiles (ANSI quantile_cont semantics)."""
    ev = _t(spark, sf_dir, "events")
    hourly = AggregationModel(
        group_by_columns=[
            ColumnModel(dimension_name="event_type"),
            ColumnModel(dimension_name="ts", function="hour", alias="hour"),
        ],
        aggregation_function="sum",
    ).apply(ev.select("event_type", "ts", "value"))
    # no intermediate rounding: each round() is a potential boundary where
    # summation-order float noise flips the result, so round only the final
    # (few-row) output
    diurnal = AggregationModel(
        group_by_columns=[ColumnModel(dimension_name="event_type")],
        aggregation_function="avg",
    ).apply(hourly)
    diurnal = diurnal.select(
        "event_type", F.round("value", 2).alias("avg_hourly_value")
    )
    distinct = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    from dsgrid_spark.operators.aggregation import percentiles_per_group

    pct = percentiles_per_group(
        ev.select("event_type", "value"), "event_type", "value"
    ).select(
        "event_type",
        F.floor(F.col("p50_value") * 1e6 + 0.5).cast("long").alias("p50_value"),
        F.floor(F.col("p90_value") * 1e6 + 0.5).cast("long").alias("p90_value"),
    )
    from dsgrid_spark.operators.reports import count_outliers

    outl = count_outliers(ev.select("event_type", "value"),
                          ["event_type"], "value", z=2.0)
    # Mergeable HLL sketches, driver-oracled (VERDICT r4 item 4):
    # hll_merge_consistent proves the mergeability contract (sketch per
    # event_id-shard, union-merged, must estimate within 1% of one
    # whole-pass sketch — equality is exact only while both sides stay in
    # sparse mode; past ~k coupons the union's mode promotion can shift
    # the estimate by a few counts, measured ±8 on ~20k at sf0.1);
    # hll_within_5pct bounds the estimate against the exact distinct count
    # (lg_k=12 → ~1.6% standard error; 5% is a safe deterministic bound).
    from dsgrid_spark.operators.aggregation import (
        distinct_sketch, merge_distinct_sketches,
    )

    sharded = ev.select(
        "event_type", "user_id",
        F.pmod(F.col("event_id"), F.lit(4)).alias("shard"))
    merged = merge_distinct_sketches(
        distinct_sketch(sharded, ["event_type", "shard"], "user_id"),
        ["event_type"], estimate_column="merged_est")
    whole = merge_distinct_sketches(
        distinct_sketch(ev, ["event_type"], "user_id"),
        ["event_type"], estimate_column="whole_est")
    hll = merged.join(whole, "event_type").join(distinct, "event_type").select(
        "event_type",
        (F.abs(F.col("merged_est") - F.col("whole_est"))
         <= 0.01 * F.col("whole_est")).alias("hll_merge_consistent"),
        (F.abs(F.col("merged_est") - F.col("n_users"))
         <= 0.05 * F.col("n_users")).alias("hll_within_5pct"),
    )
    return (diurnal.join(distinct, "event_type").join(pct, "event_type")
            .join(outl, "event_type").join(hll, "event_type"))


def q12_peak_load(spark, sf_dir, branch=None):
    """Peak-load argmax + top-k per group, both ranking windows
    (SURVEY §2.4-2.6), tagged union: 'peak' = per-type argmax row via
    peak_load; 'top3' = top-3 rows per type via top_k_per_group.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named window's plan — the q30/q32 per-branch-plan
    convention (r12)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    if branch in (None, "peak"):
        peak = peak_load(ev, ["event_type"],
                         tie_breakers=["event_id"]).select(
            F.lit("peak").alias("tag"), "event_id", "event_type",
            F.date_format("ts", TS_FMT_US).alias("peak_ts"), "value",
        )
        if branch == "peak":
            return peak
    top3 = top_k_per_group(
        ev, ["event_type"], k=3, tie_breakers=["event_id"]
    ).select(
        F.lit("top3").alias("tag"), "event_id", "event_type",
        F.date_format("ts", TS_FMT_US).alias("peak_ts"), "value",
    )
    if branch == "top3":
        return top3
    return peak.unionByName(top3)


def q14_sort_limit(spark, sf_dir):
    """Hierarchical rollup subtotals + global sort + limit (SURVEY §2.4/
    §2.6; rollup is beyond-reference — dsgrid has no grouping sets, Spark
    gives them free)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders", "total_price",
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderstatus"),
                 F.asc("o_orderpriority"))
        .limit(10)
    )


def q15_union(spark, sf_dir):
    """Set operators in one tagged union (SURVEY §2.7/2.12): dataset
    expression union '|', intersect distinct, and except distinct."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation_key"),
        F.lit("customer").alias("src"),
        F.col("c_acctbal").alias("value"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nation_key"),
        F.lit("supplier").alias("src"),
        F.col("s_acctbal").alias("value"),
    )
    u = evaluate_expression("cust | supp", {"cust": cust, "supp": supp})
    union_rows = u.groupBy("nation_key", "src").agg(
        F.round(F.sum("value"), 2).alias("sum_value")
    ).select(F.lit("union").alias("op"), "nation_key", "src", "sum_value")

    c = cust.select("nation_key")
    s = supp.select("nation_key")
    inter = c.intersect(s).select(
        F.lit("intersect").alias("op"), "nation_key",
        F.lit("-").alias("src"), F.lit(0.0).alias("sum_value"))
    exc = c.distinct().subtract(s.distinct()).select(
        F.lit("except").alias("op"), "nation_key",
        F.lit("-").alias("src"), F.lit(0.0).alias("sum_value"))
    return union_rows.unionByName(inter).unionByName(exc)


def q18_arith_expression(spark, sf_dir):
    """Dataset arithmetic 'a - b' as full-dim join (SURVEY §2.3/2.12)."""
    orders = _t(spark, sf_dir, "orders")
    a = (
        orders.filter(F.year("o_orderdate") <= 1996)
        .groupBy("o_orderpriority").agg(F.sum("o_totalprice").alias("value"))
    )
    b = (
        orders.filter(F.year("o_orderdate") > 1996)
        .groupBy("o_orderpriority").agg(F.sum("o_totalprice").alias("value"))
    )
    diff = evaluate_expression("a - b", {"a": a, "b": b})
    return diff.select("o_orderpriority", F.round("value", 2).alias("value"))


def q19_pivot(spark, sf_dir):
    """Stacked → pivoted result format (SURVEY §2.8)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus", F.col("o_totalprice").alias("value")
    )
    p = pivot(orders, "o_orderstatus", pivot_values=["F", "O", "P"])
    return p.select(
        "o_orderpriority",
        F.round("F", 2).alias("F"),
        F.round("O", 2).alias("O"),
        F.round("P", 2).alias("P"),
    )


def q20_unpivot(spark, sf_dir):
    """Pivoted → stacked unpivot/melt (SURVEY §2.8)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )
    return unpivot(li, ["l_quantity", "l_extendedprice", "l_discount"], "measure")


def q21_scalar_datetime(spark, sf_dir, branch=None):
    """Tagged union: 'month' = scalar date/arith functions in group-by
    (SURVEY §2.9); 'session' = gap-based sessionization of the events
    stream via the native session_window operator (8h gap), k2 carrying
    the session-start epoch.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named child's plan — the q30/q32 per-branch-plan
    convention (r12)."""
    from dsgrid_spark.streaming.ops import sessionize

    if branch in (None, "month"):
        li = _t(spark, sf_dir, "lineitem")
        revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        # Discretize per ROW, then sum exact integers: a float SUM's merge
        # order varies run to run (shuffle-block arrival), so round(sum(), 2)
        # is a coin flip whenever a group's total sits within an ULP of a
        # .005 boundary — caught by a one-off sf1 board hash mismatch that
        # vanished on re-run. Per-row floor(x*1e4+0.5) is the same IEEE
        # sequence on both engines, and the integer sum is associative —
        # deterministic at any scale and any execution order.
        rev_i = F.floor(revenue * 1e4 + 0.5).cast("long")
        month = (
            li.groupBy(
                F.year("l_shipdate").cast("long").alias("k1"),
                F.month("l_shipdate").cast("long").alias("k2"),
            )
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(rev_i).cast("double").alias("value"))
            .select(F.lit("month").alias("op"), "k1", "k2", "n", "value")
        )
        if branch == "month":
            return month
    ev = _t(spark, sf_dir, "events")
    session = sessionize(ev, "ts", ["user_id"], gap="8 hours",
                         value_column="value").select(
        F.lit("session").alias("op"),
        F.col("user_id").alias("k1"),
        F.unix_timestamp("session_start").alias("k2"),
        F.col("n_events").cast("long").alias("n"),
        F.floor(F.col("value_sum") * 1e6 + 0.5).cast("double").alias("value"),
    )
    if branch == "session":
        return session
    return month.unionByName(session)


def q22_unit_conversion(spark, sf_dir):
    """Unit conversion kWh→MWh via metric records (SURVEY §2.9)."""
    ev = _t(spark, sf_dir, "events")
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    from_records = spark.createDataFrame([(t, "kWh") for t in types],
                                         "id string, unit string")
    to_records = spark.createDataFrame([(t, "MWh") for t in types],
                                       "id string, unit string")
    out = convert_units(ev.select("event_id", "event_type", "value"),
                        "event_type", from_records, to_records)
    # nano-MWh integer units: value is already kWh*0.001; *1e9+floor is the
    # identical IEEE sequence DuckDB runs (value * 0.001 * 1e9)
    return out.select("event_id", "event_type",
                      F.floor(F.col("value") * 1e9 + 0.5).cast("long")
                      .alias("value_mwh_nano"))


def q23_time_downsample(spark, sf_dir, branch=None):
    """Datetime re-resolution both directions (SURVEY §2.10), tagged
    union: 'down' = events to 6h TOTAL; 'up' = daily lineitem quantities
    spread to 6-hourly TOTAL; 'cascade:hour/day/month' = continuous-
    aggregate rollup cascade (one raw shuffle, ReuseExchange-shared).

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named child's plan — the q30/q32 per-branch-plan
    convention (r12)."""
    from dsgrid_spark.timedim.conversion import upsample

    # events.value is a continuous float: discretize per ROW into integer
    # micro-units (as double), so every rollup level sums exactly-representable
    # integers — deterministic across engines, run order, and scales (sums
    # reach ~1e14 at sf10, far under 2^53). floor(sum(float)*1e6) instead
    # flipped a last micro-unit at the sf10 rehearsal (cascade:month).
    ev = _t(spark, sf_dir, "events").select(
        "ts", "event_type",
        F.floor(F.col("value") * 1e6 + 0.5).cast("double").alias("value"))
    if branch in (None, "down"):
        down = downsample(ev, "ts", 6 * 3600).select(
            F.lit("down").alias("mode"),
            F.date_format("ts", TS_FMT).alias("ts"),
            F.col("event_type").alias("grp"),
            F.col("value").cast("long").alias("value"),
        )
        if branch == "down":
            return down
    if branch in (None, "up"):
        li = _t(spark, sf_dir, "lineitem").filter(
            F.year("l_shipdate") == 1995)
        daily = li.groupBy(F.col("l_shipdate").alias("ts"),
                           "l_returnflag").agg(
            F.sum("l_quantity").alias("value")
        )
        up = upsample(daily, "ts", 86400, 21600).select(
            F.lit("up").alias("mode"),
            F.date_format("ts", TS_FMT).alias("ts"),
            F.col("l_returnflag").alias("grp"),
            F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value"),
        )
        if branch == "up":
            return up
    from dsgrid_spark.timedim.conversion import rollup_cascade

    casc = rollup_cascade(ev, "ts", ["event_type"], "value").select(
        F.concat(F.lit("cascade:"), F.col("level")).alias("mode"),
        F.date_format("ts", TS_FMT).alias("ts"),
        F.col("event_type").alias("grp"),
        F.col("value").cast("long").alias("value"),
    )
    if branch == "cascade":
        return casc
    return down.unionByName(up).unionByName(casc)


def q24_annual_to_hourly(spark, sf_dir):
    """Annual → hourly expansion with TOTAL spread (SURVEY §2.10)."""
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.year("o_orderdate").isin(1995, 1996)
    )
    annual = orders.groupBy(
        F.year("o_orderdate").cast("string").alias("model_year"),
        "o_orderpriority",
    ).agg(F.sum("o_totalprice").alias("value"))
    hourly = annual_to_hourly(annual)
    return hourly.select(
        "model_year", "o_orderpriority",
        F.date_format("timestamp", TS_FMT).alias("hour_ts"),
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value"),
    )


def q25_tz_convert(spark, sf_dir):
    """Time-zone conversion single-zone AND per-geography (SURVEY §2.10),
    tagged union."""
    ev = _t(spark, sf_dir, "events")
    single = convert_time_zone(ev.select("event_id", "ts"), "ts", "Etc/GMT+7")
    single = single.select(
        F.lit("single").alias("mode"), "event_id",
        F.lit("-").alias("geography"), F.lit("Etc/GMT+7").alias("time_zone"),
        F.date_format("ts", TS_FMT_US).alias("local_ts"),
    )
    by_geo_in = ev.withColumn(
        "geography", (F.col("user_id") % 4).cast("string")
    )
    geo = spark.createDataFrame(
        [("0", "Etc/GMT+5"), ("1", "Etc/GMT+6"), ("2", "Etc/GMT+7"), ("3", "Etc/GMT+8")],
        "id string, time_zone string",
    )
    by_geo = convert_time_zone_by_geography(
        by_geo_in.select("event_id", "ts", "geography"), "ts", geo, "geography"
    ).select(
        F.lit("by_geo").alias("mode"), "event_id", "geography", "time_zone",
        F.date_format("ts", TS_FMT_US).alias("local_ts"),
    )
    return single.unionByName(by_geo)


def q27_growth_exponential(spark, sf_dir):
    """Growth projections (SURVEY §2.12), tagged union: 'exp' =
    exponential P0*(1+r)^(t-t0); 'mult' = annual multiplier P(t)=P0*r."""
    orders = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    initial = orders.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("value")
    ).withColumn("model_year", F.lit("1995"))
    prios = [r[0] for r in initial.select("o_orderpriority").collect()]
    rates = spark.createDataFrame(
        [(p, str(y), 0.05) for p in prios for y in (1996, 1997, 1998)],
        "o_orderpriority string, model_year string, value double",
    )
    out = apply_exponential_growth(initial, rates, "1995")
    exp = out.select(
        F.lit("exp").alias("mode"),
        "o_orderpriority", "model_year", F.round("value", 2).alias("value")
    )

    from dsgrid_spark.operators.growth import apply_annual_multiplier

    all_initial = _t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("value")
    )
    all_prios = [r[0] for r in all_initial.select("o_orderpriority").collect()]
    mult_rates = spark.createDataFrame(
        [(p, float(1 + i) / 10.0) for i, p in enumerate(sorted(all_prios))],
        "o_orderpriority string, value double",
    )
    mult = apply_annual_multiplier(all_initial, mult_rates).select(
        F.lit("mult").alias("mode"),
        "o_orderpriority", F.lit("-").alias("model_year"),
        F.round("value", 2).alias("value"),
    )
    return exp.unionByName(mult)


_Q28_STREAM_DIRS: dict[str, str] = {}
_Q28_STREAM_COUNTS: dict[str, int] = {}


def _q28_batch(spark, sf_dir):
    """Batch side of q28: hash-groupBy representatives (timed separately
    in bench.py — VERDICT r4 item 2)."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        F.lit("batch").alias("op"), "doc_id", "lang", "source")


def _q28_stream(spark, sf_dir):
    """Streaming side of q28: runs the availableNow file stream with
    cross-batch dedup state and returns the memory-sink rows. The input
    files are written once per process; stream startup + two micro-batches
    execute on every call (that cost is what the bench branch records)."""
    import os
    import tempfile

    from dsgrid_spark.streaming.ops import dedup_stream, normalize_text_stream

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", "lang", "source")
    # the two input files are deterministic per sf_dir: write once per
    # process, reuse on repeat calls (bench min-of-2, driver re-runs);
    # checkpoint + sink stay fresh per call so the stream re-processes
    tmp = _Q28_STREAM_DIRS.get(sf_dir)
    if tmp is None or not os.path.isdir(f"{tmp}/b2"):
        # copy ids sit far above any rehearsal-scaled corpus id (sf10's
        # 100-replica documents reach ~995k; 1e8 is clear of any replica
        # count the scale tooling supports) — colliding ids would turn
        # distinct docs into same-key rows and corrupt the dedup check
        copies = base.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.concat(F.upper("text"), F.lit(" ... !!!")).alias("text"),
            "lang", "source",
        )
        tmp = tempfile.mkdtemp(prefix="dsgrid_q28_stream_")
        # one file per side → exactly two micro-batches (originals, then
        # copies); multi-part dirs would fan into a micro-batch per part.
        # Rows are written in doc_id order: streaming dedup keeps the
        # FIRST arrival per fingerprint, and the oracle's min-doc_id
        # representative is only equivalent when arrival order == id
        # order (true for the driver files; enforced here for any input,
        # e.g. the multi-part scale-rehearsal tables).
        base.repartition(1).sortWithinPartitions("doc_id").write.parquet(
            f"{tmp}/b1")
        copies.repartition(1).sortWithinPartitions("doc_id").write.parquet(
            f"{tmp}/b2")
        # modification times order the file stream: originals strictly first
        now = int(os.path.getmtime(tmp))
        for sub, t in (("b1", now - 100), ("b2", now + 100)):
            d = os.path.join(tmp, sub)
            for f in os.listdir(d):
                os.utime(os.path.join(d, f), (t, t))
        _Q28_STREAM_DIRS[sf_dir] = tmp
        _Q28_STREAM_COUNTS[sf_dir] = spark.read.parquet(f"{tmp}/b1").count()
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/b*")
    )
    deduped = dedup_stream(normalize_text_stream(stream), ["fingerprint"])
    run_id = tempfile.mkdtemp(prefix="dsgrid_q28_run_")
    from dsgrid_spark.session import scoped_conf

    # Size the stateful operator's state partitions to the key count:
    # dropDuplicates state partitioning is fixed at checkpoint creation
    # from spark.sql.shuffle.partitions, and each state store instance
    # pays per-micro-batch setup/commit. 32 stores for a 10k-key corpus
    # is pure overhead (measured 2.5 s -> 1.35 s at sf0.1 with 8), while
    # 8 stores for the sf10 rehearsal's 1M keys serializes state commits
    # — so derive the count from the corpus size recorded at setup
    # (a 100 TB corpus sizes this to thousands via the same conf).
    # maxPartitionBytes is dropped to 4 MB so each micro-batch's parquet
    # scan splits across cores: the per-side single file otherwise makes
    # the 500k-row fingerprint projection single-threaded.
    n_keys = 2 * _Q28_STREAM_COUNTS.get(sf_dir, 10_000)
    state_parts = max(8, min(64, n_keys // 50_000))
    # Parquet sink, not memory: a memory sink collects every surviving
    # row into the driver (500k rows at the sf10 rehearsal), which is
    # exactly the collect-bottleneck this engine avoids everywhere else.
    # The sf10 rehearsal also showed the slot is state-commit-bound
    # (~20 us/key; 8..50 state partitions within noise on one JVM), so
    # the partition count derivation is about real clusters, not this box.
    with scoped_conf(spark, {
        "spark.sql.shuffle.partitions": str(state_parts),
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    }):
        query = (deduped.writeStream.format("parquet")
                 .option("checkpointLocation", f"{run_id}/ckpt")
                 .option("path", f"{run_id}/out")
                 .outputMode("append").trigger(availableNow=True)
                 .start())
        # ADVICE r4: awaitTermination(timeout) returns False on timeout
        # with the query still running — reading the sink then would
        # yield a partially-populated result that fails the oracle
        # nondeterministically instead of erroring clearly.
        if not query.awaitTermination(240):
            query.stop()
            raise TimeoutError(
                "q28 streaming side did not finish within 240 s")
    return spark.read.parquet(f"{run_id}/out").select(
        F.lit("stream").alias("op"), "doc_id", "lang", "source")


_Q28_COMPACT_DIRS: dict[str, str] = {}


def _q28_compact(spark, sf_dir):
    """Compaction row-preservation branch (VERDICT r4 item 4): the
    documents table is written over-fragmented (32 tiny files), compacted
    by compact_parquet, and read BACK from the compacted directory — the
    oracle (plain SELECT over the source table) proves compaction
    preserved every row and value. Write+compact happen once per process
    (setup, like the stream input files); the query reads the result."""
    import tempfile

    from dsgrid_spark.sources.writers import compact_parquet

    path = _Q28_COMPACT_DIRS.get(sf_dir)
    if path is None:
        docs = _t(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source")
        tmp = tempfile.mkdtemp(prefix="dsgrid_q28_compact_")
        path = f"{tmp}/docs.parquet"
        docs.repartition(32).write.parquet(path)
        report = compact_parquet(spark, path, target_mb=64)
        assert not report["skipped"] and report["files_after"] < 32, report
        _Q28_COMPACT_DIRS[sf_dir] = path
    return spark.read.parquet(path).select(
        F.lit("compact").alias("op"), "doc_id", "lang", "source")


def _q28_bloom(spark, sf_dir):
    """Bloom-gated incremental exact dedup: the batch (doc_id >= 250) is
    split MAP-SIDE by a broadcast Bloom filter over the corpus (< 250)
    fingerprints — "definitely new" rows (no false negatives) skip the
    exact join entirely; only the maybe-present remainder is verified
    with an anti join. Provably equal to the plain cross-corpus anti
    join, which is what the oracle checks. At 100 TB this is the ingest
    shape: a fixed-size bitset ships once instead of shuffling the batch
    against the corpus's full key set (pipeline/bloom.py)."""
    from dsgrid_spark.pipeline.bloom import bloom_prefilter, build_bloom
    from dsgrid_spark.pipeline.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    fps = corpus.select(fingerprint(F.col("text")).alias("__fp")).distinct()
    fps = fps.persist()
    # expected_items from the split bound (doc_id < 250 => at most 250
    # distinct fingerprints): sizing needs only an upper bound, so skip
    # the extra count() job per call. The build's distinct+bit-fold
    # shuffles a few hundred rows — scope the shuffle width down so the
    # construction job doesn't schedule 32 tasks per stage for them.
    from dsgrid_spark.session import scoped_conf

    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        bloom = build_bloom(fps, "__fp", expected_items=250, fpp=0.01)
    batch = docs.filter(F.col("doc_id") >= 250).withColumn(
        "__fp", fingerprint(F.col("text")))
    maybe, fresh = bloom_prefilter(batch, bloom, "__fp")
    survivors = fresh.unionByName(maybe.join(fps, "__fp", "left_anti"))
    return survivors.select(F.lit("bloom").alias("op"), "doc_id",
                            "lang", "source")


def q28_dedup_exact(spark, sf_dir):
    """Exact dedup, batch AND streaming (pipeline + streaming ops),
    tagged union. 'batch' = hash-groupBy representatives. 'stream' =
    the same corpus plus normalization-identical copies (id+1e8,
    upper-cased + punctuation) lands as TWO files streamed one file per
    micro-batch (originals first, copies second by modification time),
    deduped on the batch pipeline's fingerprint with cross-batch state —
    survivors must be exactly the originals, proving streaming dedup
    state equals batch exact_dedup on the same keys. 'compact' =
    small-files compaction round-trip over the documents table (row/value
    preservation oracled against the source rows). 'bloom' = broadcast
    Bloom pre-filtered incremental dedup (batch vs corpus fingerprints),
    provably equal to the plain anti join."""
    return (_q28_batch(spark, sf_dir)
            .unionByName(_q28_stream(spark, sf_dir))
            .unionByName(_q28_compact(spark, sf_dir))
            .unionByName(_q28_bloom(spark, sf_dir)))


def q29_text_stats(spark, sf_dir):
    """Token counting + quality components + corpus-trained bigram LM
    familiarity score + BM25 relevance against a fixed query (pipeline
    ops). The bm25_micro column uses the operator's exact-integer mode:
    rational idf and a fixed IEEE op sequence, so DuckDB reproduces it
    bit-for-bit (ln idf differs in the last ulp across libm builds)."""
    from dsgrid_spark.pipeline.text import bigram_familiarity, bm25_scores

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n = F.length(t)
    stats = docs.select(
        "doc_id",
        token_count(t).cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_tokens_bpe"),
        # Integer ppm via floor: IEEE double division + floor are bit-identical
        # across Spark and DuckDB, unlike round-to-6-places (last-ULP mismatch).
        F.floor(F.when(n > 0, alpha * F.lit(1000000.0) / n).otherwise(F.lit(0.0)))
        .cast("long").alias("alpha_ratio_ppm"),
    )
    bm25 = bm25_scores(docs, ["window", "stream", "vector"], micro=True)
    return (
        stats.join(bigram_familiarity(docs, "doc_id", "text"), "doc_id")
        .join(bm25, "doc_id", "left")
        .withColumn("bm25_micro",
                    F.coalesce(F.col("bm25_micro"), F.lit(0)).cast("long"))
    )


def q30_minhash_dedup(spark, sf_dir, branch=None):
    """MinHash+LSH near-dedup survivors, oracle-checked against exact
    all-pairs Jaccard in DuckDB: drop any doc with a smaller-id neighbor
    at jaccard >= 0.8. 8 bands x 3 rows keeps catch probability ~1 at
    the 0.8 threshold (1-(1-s^3)^8 = 0.997 at s=0.8, ~1 above 0.9)
    while costing 25% less signature codegen than 32 hashes.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named branch's plan — the r8 per-branch-plan convention:
    the r9 'store' branch WRITES a signature store during query
    construction, and without this the pinned 'full'/'incr' timings
    would each pay that disk write (the q32 r7 drift failure class).

    Tagged union: 'full' = whole-corpus dedup; 'incr' = the batch path —
    docs >= 250 deduped against the < 250 corpus via its PRECOMPUTED
    signatures (incremental_dedup), which must provably equal the full
    survivors restricted to the new ids (same all-pairs oracle with a
    WHERE); 'store' (r9) = the same batch deduped against a PERSISTED
    signature store (sigstore.py) — the cross-run ingest path, same
    expected survivors by bit-exact signature equality."""
    from dsgrid_spark.pipeline.dedup import (
        band_signatures, incremental_dedup, minhash_signatures,
    )

    from dsgrid_spark.session import ensure_min_partitions

    docs = _t(spark, sf_dir, "documents")
    # ONE persisted signature pass feeds all three consumers (full-dedup
    # LSH, reference band side, batch band side) — the r3 audit found each
    # branch re-folding signatures from scratch. The fold input is widened
    # to the core count first: the sf0.1 documents table is ONE parquet
    # split, and the signature fold (~1 ms/doc) otherwise runs
    # single-threaded (measured 5.0 s -> 0.7 s at sf0.1; no-op on a
    # many-split corpus).
    sigs = minhash_signatures(ensure_min_partitions(docs), "text",
                              num_hashes=24,
                              shingle_k=5).select("doc_id", "minhash")
    # ONE eager count materializes BOTH caches (r12): bands derives from
    # sigs, so bands.count() fills the sigs cache on the way — a single
    # single-reference action, so no concurrent-scan cache races (the
    # r3-measured failure mode of dropping eager counts entirely was
    # LAZY caches racing inside the final union action, which this
    # still prevents). One banding pass feeds all three band consumers
    # (bands=/reference_bands=/new_bands= — r5): the full-dedup bucket
    # self-join and both incremental sides slice this persisted table
    # instead of re-banding the signatures three times.
    sigs = sigs.persist()
    bands = band_signatures(sigs, "doc_id", 8, 24).persist()
    bands.count()
    # r12: construct ONLY the named branch's operators — the per-branch
    # convention this docstring promises. Before, branch='incr' still
    # paid the full-dedup eager materialization and branch='store' paid
    # full AND incr (measured 43 of the store branch's 95 jobs, ~3.5 s).
    # branch=None (the driver/slot path) constructs all three, unchanged.
    if branch in (None, "full"):
        full = minhash_dedup(docs, "text", "doc_id", num_hashes=24,
                             num_bands=8, shingle_k=5, threshold=0.8,
                             signatures=sigs, bands=bands)
        if branch == "full":
            return full.select(F.lit("full").alias("op"), "doc_id")
    ref = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    # the batch side is IDENTICAL for 'incr' and 'store' (only the
    # reference differs), so exact-dedup the batch and compute its
    # within-batch drop set ONCE and pass both to each call (r12;
    # dedup.within_batch_drop) — before, the store call re-ran the
    # exact-dedup shuffle, the candidate self-join and the shingle
    # verify the incr call had just done
    from dsgrid_spark.pipeline.dedup import exact_dedup, within_batch_drop

    new_uniq = exact_dedup(new, "text", "doc_id").persist()
    wb_drop = within_batch_drop(
        new_uniq, sigs.filter(F.col("doc_id") >= 250), "text", "doc_id",
        num_hashes=24, num_bands=8, shingle_k=5, threshold=0.8,
        bands=bands.filter(F.col("doc_id") >= 250))
    if branch in (None, "incr"):
        incr = incremental_dedup(
            new, sigs.filter(F.col("doc_id") < 250), ref,
            "text", "doc_id",
            num_hashes=24, num_bands=8, shingle_k=5,
            threshold=0.8,
            new_sigs=sigs.filter(F.col("doc_id") >= 250),
            reference_bands=bands.filter(F.col("doc_id") < 250),
            new_bands=bands.filter(F.col("doc_id") >= 250),
            new_uniq=new_uniq, within_drop=wb_drop)
        if branch == "incr":
            return incr.select(F.lit("incr").alias("op"), "doc_id")
    # 'store' (r9): the SAME incremental pass with the reference side
    # read back from a persisted, indexlog-managed signature store
    # (pipeline/sigstore.py) — the continuous-ingest path where the
    # corpus' signatures survive across runs with exactly-once appends.
    # Signatures are integer-exact, so store == DataFrame reference
    # bit-for-bit and the same restricted all-pairs oracle applies.
    import shutil
    import tempfile

    from dsgrid_spark.pipeline.sigstore import (
        read_sig_store, write_sig_store,
    )

    tmp = tempfile.mkdtemp(prefix="dsgrid_q30_store_")
    try:
        # n_shards=4: the shard level exists to bound per-directory file
        # counts at corpus scale; a 250-doc reference store pays 16
        # write tasks' fixed latency for nothing (layout-only knob,
        # signatures identical)
        write_sig_store(ref, f"{tmp}/store", num_hashes=24, shingle_k=5,
                        n_shards=4,
                        signatures=sigs.filter(F.col("doc_id") < 250))
        # materialize the reference read ONCE: incremental_dedup
        # traverses its reference side several times (banding + bucket
        # join), and each lazy traversal would re-run the committed-
        # batch log read + store scan (measured 7.5 s -> ~4 s at
        # sf0.1) — the same read-once discipline a real ingest uses
        store_ref = read_sig_store(spark,
                                   f"{tmp}/store").localCheckpoint()
        store = incremental_dedup(
            new, store_ref, ref,
            "text", "doc_id", num_hashes=24, num_bands=8, shingle_k=5,
            threshold=0.8,
            new_sigs=sigs.filter(F.col("doc_id") >= 250),
            new_bands=bands.filter(F.col("doc_id") >= 250),
            new_uniq=new_uniq, within_drop=wb_drop)
        store = (store.select(F.lit("store").alias("op"), "doc_id")
                 .localCheckpoint())  # materialize before the dir vanishes
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if branch == "store":
        # r12: the store branch returns ONLY its own rows (the bench's
        # per-branch-plan convention) — before, it fell through to the
        # whole union, so the 'store' timing re-executed full+incr too
        return store
    return (full.select(F.lit("full").alias("op"), "doc_id")
            .unionByName(incr.select(F.lit("incr").alias("op"), "doc_id"))
            .unionByName(store))


def q31_simhash_dedup(spark, sf_dir, branch=None):
    """SimHash near-dedup survivors with an exact oracle; tagged union
    over both blocking geometries ('chunk' = 4x16 pigeonhole, 'manku' =
    wide-prefix C(6,3)). Natural text defeats any SQL oracle here
    (simhash distance is word-bag based and not reproducible without
    xxhash64), so the corpus is constructed: per doc, 24 tokens unique
    to that doc (signatures mutually far), plus one
    normalization-identical copy per doc (upper-cased + punctuation →
    identical signature, hamming 0). Expected survivors = exactly the
    originals under EITHER blocking — verifying normalization, signature
    determinism, both blocking schemes, and the xor-verify anti-join end
    to end.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named blocking geometry's plan — the q30/q32 per-branch
    convention (r12). The shared bit-vote fold (``sigs``) is persisted
    either way, so per-branch timing still measures one fold + one
    blocking pass, exactly the branch's fixed work."""
    from dsgrid_spark.session import ensure_min_partitions

    # widen BEFORE constructing text: only 8-byte ids shuffle, and the
    # expensive simhash fold downstream runs on all cores even when the
    # documents scan is a handful of splits (sf10: the fold dominated,
    # 17 s -> 6 s). Gated on the table's on-disk size (an os.stat, no
    # Spark job): at bench scale the fold is sub-second single-threaded
    # and the extra Exchange measured 0.8 s of pure overhead.
    ids = _t(spark, sf_dir, "documents").select("doc_id")
    if _table_bytes(sf_dir, "documents") > 32 * 1024 * 1024:
        ids = ensure_min_partitions(ids)
    base = ids.withColumn(
        "text",
        F.expr("array_join(transform(sequence(1, 24),"
               " j -> concat('w', doc_id, 'x', j)), ' ')"),
    )
    copies = base.select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit(" ... !!!")).alias("text"),
    )
    corpus = base.unionByName(copies)
    # tagged union: 'chunk' = default 4x16-bit pigeonhole blocking;
    # 'manku' = wide-prefix C(6,3) blocking (the >=10M-doc scale path —
    # buckets ~n*20/2^33 instead of ~n/2^16). Both satisfy the hamming<=3
    # pigeonhole bound, so the survivor sets are provably identical.
    # ONE persisted bit-vote fold feeds both geometries (the fold is the
    # dominant cost; the minhash one-pass-feeds-all-consumers contract).
    from dsgrid_spark.pipeline.dedup import simhash_signatures

    sigs = simhash_signatures(corpus, "text", "doc_id").persist()
    sigs.count()
    if branch in (None, "chunk"):
        chunk = simhash_dedup(corpus, "text", "doc_id", hamming_threshold=3,
                              signatures=sigs)
        if branch == "chunk":
            return chunk.select(F.lit("chunk").alias("op"), "doc_id")
    manku = simhash_dedup(corpus, "text", "doc_id", hamming_threshold=3,
                          n_blocks=6, prefix_blocks=3, signatures=sigs)
    if branch == "manku":
        return manku.select(F.lit("manku").alias("op"), "doc_id")
    return (
        chunk.select(F.lit("chunk").alias("op"), "doc_id")
        .unionByName(manku.select(F.lit("manku").alias("op"), "doc_id"))
    )


def q32_similarity_bruteforce(spark, sf_dir, branch=None):
    """Exact brute-force cosine top-k (pipeline op), tagged union with
    the round-7 'rrf' branch: hybrid retrieval via Reciprocal Rank
    Fusion (Cormack et al., SIGIR 2009) of the semantic (cosine top-5
    per query) and lexical (global BM25-micro top-5, the
    authority-prior pattern) candidate lists. Ranks are integers on
    both engines (cosine ranks reuse q32's proven ordering; BM25 ranks
    order integer micro-scores), and the fused score is a fixed-order
    two-term expression of exact rank reciprocals — floor(x*1e9 + 0.5)
    discretizes it identically cross-engine. Round-11 adds 'bdf': the
    DataFrame-query form of the PERSISTED bm25_search in micro-exact
    mode — a real on-disk term index built during query construction,
    searched with a (query_id, terms) frame, per-query top-5 integer
    scores oracled bit-for-bit.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named branch's plan: the r7 canonical series drifted
    0.536 -> 0.858 s on 'brute' with zero row-work change because a
    tag filter prunes the rrf side's EXECUTION but the branch timing
    still paid the whole union's plan construction/analysis (BM25
    scoring + full-outer fuse). Per-branch construction restores the
    fixed-work meaning of the pinned series."""
    from dsgrid_spark.pipeline.retrieval import rrf_fuse
    from dsgrid_spark.pipeline.text import bm25_scores

    # r12: construct ONLY the named branch's operators (the q30
    # convention, applied here too) — branch='bdf' was paying ~0.9 s of
    # brute/rrf plan construction it never executed
    if branch in (None, "brute", "rrf"):
        emb = _t(spark, sf_dir, "embeddings").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = brute_force_topk(emb, queries, k=5)
        brute = out.select(
            F.lit("brute").alias("op"), "query_id", "vec_id",
            F.floor(F.col("score") * 1e6 + 0.5).cast("long").alias("score"))
        if branch == "brute":
            return brute

    docs = _t(spark, sf_dir, "documents")
    if branch in (None, "rrf"):
        lex_top = (bm25_scores(docs, ["window", "stream", "vector"],
                               micro=True)
                   .orderBy(F.desc("bm25_micro"), F.asc("doc_id")).limit(5))
        lex = queries.select("query_id").crossJoin(
            lex_top.select(F.col("doc_id").alias("vec_id"),
                           F.col("bm25_micro").cast("double")
                           .alias("score")))
        fused = rrf_fuse([out.select("query_id", "vec_id", "score"), lex],
                         id_column="vec_id", score_column="score",
                         group_columns=("query_id",))
        rrf = fused.select(
            F.lit("rrf").alias("op"), "query_id", "vec_id",
            F.floor(F.col("rrf") * 1e9 + 0.5).cast("long").alias("score"))
        if branch == "rrf":
            return rrf
    # 'bdf' (r11): the DataFrame-query form of the PERSISTED bm25_search
    # in micro-exact integer mode — the round-11 lexical twin of q33's
    # 'hdf' ANN branch, under the same oracle discipline: the index is
    # built on disk during query construction (q30-'store' convention,
    # isolated behind branch= so the pinned 'brute'/'rrf' timings never
    # pay the build), queries ride a (query_id, terms) DataFrame through
    # the column-expression analyzer, and the integer micro scores are
    # reproduced bit-for-bit by the DuckDB oracle (same rational-idf
    # fixed IEEE sequence as q29/the 'rrf' lexical side).
    import shutil
    import tempfile

    from dsgrid_spark.pipeline.retrieval import bm25_search, write_term_index
    from dsgrid_spark.session import one_slice_df

    tmp = tempfile.mkdtemp(prefix="dsgrid_q32_bdf_")
    try:
        write_term_index(docs, f"{tmp}/terms", id_column="doc_id",
                         text_column="text", n_buckets=8)
        qdf = one_slice_df(
            spark,
            [(0, ["window", "stream"]), (1, ["vector", "stream"]),
             (2, ["window", "vector"])],
            "query_id long, terms array<string>")
        bdf = (bm25_search(spark, f"{tmp}/terms", qdf, k=5, micro=True)
               .select(F.lit("bdf").alias("op"), "query_id",
                       F.col("id").alias("vec_id"),
                       F.col("bm25_micro").alias("score"))
               .localCheckpoint())  # materialize before the dir vanishes
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if branch == "bdf":
        return bdf
    return brute.unionByName(rrf).unionByName(bdf)


def q33_similarity_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-k with a provable exact oracle.

    Fixture: 15 vectors in 3 groups (vec_id % 3); group g's members are
    positive scalings of one direction (3,4) on axis pair (2g, 2g+1).
    Positive scaling preserves sign(dot(v, plane)) for every hyperplane,
    so each group provably shares one LSH bucket for ANY planes; disjoint
    axis supports make cross-group cosine exactly 0.0 and within-group
    exactly 1.0 (integer-exact FP). Hence LSH top-5 == brute-force top-5,
    and the q32-style brute-force SQL is an exact oracle.
    """
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 15)
    g = F.col("vec_id") % 3
    mag = (F.col("vec_id") + 1).cast("double")
    embedding = F.array(*[
        F.when(g == i // 2,
               mag * F.lit(3.0 if i % 2 == 0 else 4.0)).otherwise(F.lit(0.0))
        for i in range(6)
    ])
    corpus = emb.select("vec_id", embedding.alias("embedding"))
    queries = corpus.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # scores are exactly 1.0 / 0.0 by integer-exact construction (see
    # docstring), so floor(score*1e6) is exact on both engines.
    # 'probe' branch: multi-probe (3 probes) provably returns the SAME
    # top-5 — probing only ADDS candidates, cross-group candidates score
    # exactly 0.0, and each group has exactly 5 members at exactly 1.0,
    # so the re-rank window is unchanged. One oracle covers both paths.
    single = lsh_topk(corpus, queries, dim=6, k=5, n_planes=6)
    probe = lsh_topk(corpus, queries, dim=6, k=5, n_planes=6, n_probes=3)
    sc = F.floor(F.col("score") * 1e6 + 0.5).cast("long").alias("score")

    # 'ham' (r8): 1-bit sign quantization + Hamming top-k over the REAL
    # embeddings table — the binary-embedding scan (~1 bit/dim payload,
    # XOR+popcount per candidate). Hamming distance is an exact integer
    # (count of sign disagreements), so the oracle recomputes it
    # directly from element signs with identical (distance asc, id asc)
    # ordering — no packing needed cross-engine.
    from dsgrid_spark.pipeline.similarity import hamming_topk

    emb_full = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    hq = emb_full.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    ham = hamming_topk(emb_full, hq, k=5).select(
        F.lit("ham").alias("op"), "query_id", "vec_id",
        F.col("hamming").cast("long").alias("score"))

    # 'hdisk' (r9): the PERSISTED binary index end-to-end — sign bits
    # packed ONCE into a temp cluster/batch-partitioned tree
    # (bits-only: store_vectors=False is the ~62x scan-replica tier),
    # then the committed-batch, partition-pruned XOR+popcount search.
    # A full probe (n_probe = n_clusters = 2) makes the search
    # exhaustive, so results equal the in-memory 'ham' scan and the
    # same sign-disagreement SQL oracle applies. Hamming distances are
    # integer-exact, so disk == memory bit-for-bit.
    import shutil
    import tempfile

    from dsgrid_spark.pipeline.similarity import (
        hamming_search, write_binary_index,
    )

    cents = [[1.0] + [0.0] * 63, [-1.0] + [0.0] * 63]
    tmp = tempfile.mkdtemp(prefix="dsgrid_q33_hdisk_")
    try:
        write_binary_index(emb_full, f"{tmp}/idx", cents,
                           store_vectors=False)
        hq_list = [(r["query_id"], list(r["embedding"]))
                   for r in hq.collect()]
        hdisk = hamming_search(spark, f"{tmp}/idx", hq_list, k=5,
                               n_probe=2, rerank=False).select(
            F.lit("hdisk").alias("op"), "query_id",
            F.col("id").alias("vec_id"),
            F.col("hamming").cast("long").alias("score"),
        ).localCheckpoint()  # materialize before the index dir vanishes

        # 'hdf' (r10): the SAME on-disk index searched with a
        # DataFrame query set — the offline-eval form (distributed
        # probes, codegen bit packing, no driver collect). Hamming
        # distances are integer-exact and the probe is full, so the
        # same sign-disagreement oracle applies and DF == list form
        # bit-for-bit.
        hdf = hamming_search(spark, f"{tmp}/idx", hq, k=5,
                             n_probe=2, rerank=False).select(
            F.lit("hdf").alias("op"), "query_id",
            F.col("id").alias("vec_id"),
            F.col("hamming").cast("long").alias("score"),
        ).localCheckpoint()

        # 'rebal' (r10): REBALANCE end-to-end — a second persisted
        # index (store_vectors=True: rebalance re-clusters from the
        # stored payload) has its centroids RETRAINED on the committed
        # corpus and every row reassigned, atomically flipped through
        # the compactions/ log (pipeline/rebalance.py). Bits are moved,
        # never recomputed, and a full probe of the new generation is
        # exhaustive, so the same integer-exact sign-disagreement
        # oracle applies — the retrain/reassign/flip machinery is what
        # the branch puts under the driver gate.
        from dsgrid_spark.pipeline.rebalance import rebalance_index

        write_binary_index(emb_full, f"{tmp}/ridx", cents)
        rebalance_index(spark, f"{tmp}/ridx", n_clusters=2,
                        iterations=2, init="sample")
        rebal = hamming_search(spark, f"{tmp}/ridx", hq_list, k=5,
                               n_probe=2, rerank=False).select(
            F.lit("rebal").alias("op"), "query_id",
            F.col("id").alias("vec_id"),
            F.col("hamming").cast("long").alias("score"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return (single.select(F.lit("single").alias("op"),
                          "query_id", "vec_id", sc)
            .unionByName(probe.select(F.lit("probe").alias("op"),
                                      "query_id", "vec_id", sc))
            .unionByName(ham)
            .unionByName(hdisk)
            .unionByName(hdf)
            .unionByName(rebal))


def q34_multimodal_features(spark, sf_dir):
    """Binary media column plumbing via mapInPandas (stubbed decode)."""
    from dsgrid_spark.pipeline.multimodal import repartition_by_size

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.length("text").cast("long").alias("n_bytes"),
    )
    # the documented scale pattern: range-partition by payload size so
    # Arrow batches are uniform before the decode fan-out
    media = repartition_by_size(media, 8)
    return extract_image_features(media).select("media_id", "width", "height")


def q36_index_time(spark, sf_dir):
    """Index time → datetime with per-geography zone offsets, plus modular
    time wrapping onto a target range (SURVEY §2.10), tagged union."""
    from dsgrid_spark.timedim.conversion import wrap_time
    from dsgrid_spark.timedim.index_time import index_to_datetime

    ev = _t(spark, sf_dir, "events")
    idx_in = ev.select(
        "event_id",
        (F.col("event_id") % 24).cast("int").alias("time_index"),
        (F.col("user_id") % 2).cast("string").alias("geography"),
        "value",
    )
    geo = spark.createDataFrame(
        [("0", "Etc/GMT+5"), ("1", "Etc/GMT+8")], "id string, time_zone string"
    )
    idx = index_to_datetime(idx_in, "2024-06-01 00:00:00", 3600,
                            geography_records=geo,
                            geography_column="geography").select(
        F.lit("index").alias("mode"), "event_id", "geography",
        F.date_format("timestamp", TS_FMT).alias("ts"),
        "value",
    )
    wrapped = wrap_time(ev.select("event_id", "ts"), "ts",
                        "2024-01-01 00:00:00", "2024-01-08 00:00:00").select(
        F.lit("wrap").alias("mode"), "event_id",
        F.lit("-").alias("geography"),
        F.date_format("ts", TS_FMT_US).alias("ts"),
        F.lit(0.0).alias("value"),
    )
    return idx.unionByName(wrapped)


def q37_leap_day(spark, sf_dir):
    """Calendar-consistency pair (SURVEY §2.10), tagged union: 'leap' =
    leap-day adjustment DROP_FEB29 + DROP_JAN1 row/value counts; 'gaps' =
    time-consistency report of missing hours per dimension combo against
    the configured calendar."""
    from dsgrid_spark.dimensions import LeapDayAdjustmentType
    from dsgrid_spark.timedim.calendar import datetime_calendar
    from dsgrid_spark.timedim.conversion import adjust_leap_day

    ev = _t(spark, sf_dir, "events")
    adj = adjust_leap_day(ev.select("event_id", "ts", "value"), "ts",
                          LeapDayAdjustmentType.DROP_FEB29)
    adj = adjust_leap_day(adj, "ts", LeapDayAdjustmentType.DROP_JAN1)
    leap = adj.groupBy(
        F.month("ts").cast("string").alias("key")
    ).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value")
    ).select(F.lit("leap").alias("mode"), "key", "n", "value")

    actual = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).distinct()
    cal = datetime_calendar(spark, "2024-01-01 00:00:00",
                            "2024-01-30 23:00:00", 3600, column="hour")
    combos = ev.select("event_type").distinct().crossJoin(cal)
    missing = combos.join(actual, ["event_type", "hour"], "left_anti")
    gaps = missing.groupBy(F.col("event_type").alias("key")).agg(
        F.count("*").alias("n")
    ).select(F.lit("gaps").alias("mode"), "key", "n",
             F.lit(0.0).alias("value"))
    return leap.unionByName(gaps)


def q40_pivoted_load(spark, sf_dir):
    """Pivoted-format dataset load: unpivot value columns on read, NULLs
    dropped as expected-missing (SURVEY §1.1/§2.8)."""
    from dsgrid_spark.datasets.handlers import DatasetConfig, OneTableHandler

    orders = _t(spark, sf_dir, "orders")
    pivoted = pivot(
        orders.select("o_orderpriority", "o_orderstatus",
                      F.col("o_totalprice").alias("value")),
        "o_orderstatus", pivot_values=["F", "O", "P"],
    )
    handler = OneTableHandler(
        pivoted,
        DatasetConfig(
            dataset_id="orders_pivoted",
            time_columns=[],
            pivoted_columns=["F", "O", "P"],
            pivoted_dimension="o_orderstatus",
            trivial_dimensions={"scenario": "base"},
        ),
    )
    return handler.df.select(
        "o_orderpriority", "o_orderstatus", "scenario",
        F.round("value", 2).alias("value"),
    )


def q41_representative_time(spark, sf_dir):
    """Representative-period templates → real timestamps, BOTH formats
    (SURVEY §2.10), tagged union: 'dow' = (month, day_of_week, hour);
    'weekday' = (month, is_weekday, hour). Fixed-offset zones so the
    oracle is session-tz independent."""
    from dsgrid_spark.timedim.representative import representative_to_datetime

    ev = _t(spark, sf_dir, "events").withColumn(
        "geography", (F.col("user_id") % 2).cast("string")
    )
    template = (
        ev.groupBy(
            F.month("ts").alias("month"),
            ((F.dayofweek("ts") + 5) % 7).alias("day_of_week"),
            F.hour("ts").alias("hour"),
            "geography",
        )
        .agg(F.round(F.sum("value"), 2).alias("value"))
        .filter(F.col("month") == 1)
    )
    geo = spark.createDataFrame(
        [("0", "Etc/GMT+6"), ("1", "Etc/GMT+7")], "id string, time_zone string"
    )
    dow = representative_to_datetime(
        template, geo, 2024, geography_column="geography"
    ).select(
        F.lit("dow").alias("fmt"), "geography",
        F.date_format("timestamp", TS_FMT).alias("utc_hour"),
        "value",
    )

    from dsgrid_spark.dimensions import RepresentativePeriodFormat

    wk_template = (
        ev.groupBy(
            F.month("ts").alias("month"),
            (((F.dayofweek("ts") + 5) % 7) < 5).alias("is_weekday"),
            F.hour("ts").alias("hour"),
            "geography",
        )
        .agg(F.round(F.sum("value"), 2).alias("value"))
        .filter(F.col("month") == 1)
    )
    weekday = representative_to_datetime(
        wk_template, geo, 2024,
        fmt=RepresentativePeriodFormat.ONE_WEEKDAY_DAY_AND_ONE_WEEKEND_DAY_PER_MONTH_BY_HOUR,
        geography_column="geography",
    ).select(
        F.lit("weekday").alias("fmt"), "geography",
        F.date_format("timestamp", TS_FMT).alias("utc_hour"),
        "value",
    )
    return dow.unionByName(weekday)


def q42_language_id(spark, sf_dir):
    """Marker-based language identification + quality scoring +
    Gopher-style repetition metrics + the C4-style filter FUNNEL
    (pipeline ops), tagged union: 'doc' = per-document metrics; 'funnel'
    = each document charged to the first quality rule it fails, one
    row per rule with the drop count; 'clf' (r8) = the sparse
    hashed-n-gram classifier (pipeline/text.py
    sparse_logistic_regression) TRAINED at query time on a constructed
    keyword-separable corpus and scored over it — the cross-engine
    oracle is the construction rule itself (doc_id % 3 spam/ham): on a
    separable corpus full-batch GD converges to margins orders of
    magnitude above float-sum noise (measured min |p − 0.5| = 0.457 at
    sf0.01 after 15 iterations), so the predicted LABEL (never the
    probability) is engine-reproducible. Truth is echoed in
    dup_word_ppm so the oracle cross-checks prediction == rule."""
    from dsgrid_spark.pipeline.text import (
        alpha_ratio_ppm, dup_word_ppm, filter_funnel,
        hashed_ngram_features, language_id, quality_score,
        sparse_logistic_regression, sparse_predict_proba, top_bigram_ppm,
    )

    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    doc_rows = docs.select(
        F.lit("doc").alias("op"),
        "doc_id",
        language_id(t).alias("lang_pred"),
        F.floor(quality_score(t) * 1e6 + 0.5).cast("long").alias("quality"),
        dup_word_ppm(t).alias("dup_word_ppm"),
        top_bigram_ppm(t).alias("top_bigram_ppm"),
    )
    rules = [
        ("short", F.length(t) >= 200),
        ("nonalpha", alpha_ratio_ppm(t) >= 800000),
        ("repetitive", dup_word_ppm(t) < 400000),
        ("lang", language_id(t) != F.lit("und")),
    ]
    _survivors, stats = filter_funnel(docs, rules)
    idx = (F.when(F.col("rule") == "short", 0)
           .when(F.col("rule") == "nonalpha", 1)
           .when(F.col("rule") == "repetitive", 2)
           .when(F.col("rule") == "lang", 3)
           .otherwise(4))
    funnel_rows = stats.select(
        F.lit("funnel").alias("op"),
        idx.cast("long").alias("doc_id"),
        F.col("rule").alias("lang_pred"),
        F.col("n_docs").alias("quality"),
        F.lit(0).cast("long").alias("dup_word_ppm"),
        F.lit(0).cast("long").alias("top_bigram_ppm"),
    )

    # 'clf': constructed separable training corpus over the table's own
    # doc ids (fixed 200 rows at every sf — training cost is constant);
    # feature hashing + full-batch GD run HERE (driver loop, bounded
    # collects of <= n_buckets gradient rows per iteration)
    train = docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("buy cheap pills now click here "))
            .otherwise(F.lit("the quarterly report discusses revenue "
                             "and strategy ")),
            F.lit("filler"), (F.col("doc_id") % 7).cast("string"),
            F.lit(" token"), (F.col("doc_id") % 5).cast("string"),
        ).alias("text"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("y"),
    )
    nb = 1 << 10
    feats = hashed_ngram_features(train, n_buckets=nb,
                                  keep_columns=("y",)).localCheckpoint()
    bias, wts = sparse_logistic_regression(feats, "y", n_buckets=nb,
                                           iterations=15, lr=0.5)
    clf_rows = sparse_predict_proba(feats, bias, wts).select(
        F.lit("clf").alias("op"),
        "doc_id",
        F.when(F.col("proba") > 0.5, F.lit("spam"))
         .otherwise(F.lit("ham")).alias("lang_pred"),
        (F.col("proba") > 0.5).cast("long").alias("quality"),
        F.col("y").cast("long").alias("dup_word_ppm"),
        F.lit(0).cast("long").alias("top_bigram_ppm"),
    )
    return doc_rows.unionByName(funnel_rows).unionByName(clf_rows)


def q43_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard duplicate pairs + benchmark-contamination
    scan (pipeline ops), tagged union. The contamination fixture injects
    a benchmark sentence into every 50th document so the leak check has
    guaranteed hits: 'contam' rows carry (doc_id, n_matched_shingles)."""
    from dsgrid_spark.pipeline.dedup import (
        benchmark_contamination, ngram_jaccard_pairs,
    )

    from dsgrid_spark.pipeline.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    dup = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_k=5,
                              threshold=0.8)
    jac = dup.select(
        F.lit("jaccard").alias("op"), "id_a", "id_b",
        F.floor(F.col("jaccard") * 1e6 + 0.5).cast("long").alias("score"),
    )
    # leakage-safe split over the SAME verified pairs: the oracle
    # recomputes components via a recursive CTE and the md5 hash-bucket
    # recipe, so cluster-atomic assignment is independently checked
    split = leakage_safe_split(docs, "doc_id", dup, 0.3, salt="sp").select(
        F.lit("split").alias("op"),
        F.col("doc_id").alias("id_a"),
        F.when(F.col("split") == "holdout", F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("id_b"),
        F.lit(0).cast("long").alias("score"),
    )

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, text string",
    )
    corpus = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 0,
               F.concat("text", F.lit(" alpha beta gamma delta epsilon"
                                      " zeta eta theta")))
        .otherwise(F.col("text")),
    )
    contam = benchmark_contamination(corpus, bench, shingle_k=5).select(
        F.lit("contam").alias("op"),
        F.col("doc_id").alias("id_a"),
        F.col("n_matched_shingles").alias("id_b"),
        F.lit(0).cast("long").alias("score"),
    )
    return jac.unionByName(contam).unionByName(split)


def _q44_pair(spark, sf_dir):
    """Embedding-cosine near-dup pairs (pipeline op).

    The synthetic embeddings have no natural near-dups (max pairwise
    cosine ~0.51), so the corpus is augmented with scaled copies
    (cosine == 1.0 by construction) — the op must find exactly those.
    """
    from dsgrid_spark.pipeline.similarity import cosine_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    out = cosine_neardup_pairs(corpus, threshold=0.999)
    # DELIBERATELY round, not floor-micro: scores here sit exactly AT 1.0
    # (a floor boundary) and the engines compute cosine differently
    # (sqrt(a)*sqrt(b) vs sqrt(a*b)), so 1.0±ulp would coin-flip under
    # floor; round(...,6) is robust precisely because 1.0 is far from a
    # .5e-6 rounding boundary.
    return out.select(
        F.lit("pair").alias("op"), "id_a", "id_b",
        F.round("score", 6).alias("score"))


def _q44_sem(spark, sf_dir):
    # 'sem' branch: SemDeDup cluster-blocked semantic dedup
    # (similarity.semantic_dedup) on a CONSTRUCTED provable corpus.
    # Each vec_id becomes a unit vector in its group's own 2D plane
    # (group g = vec_id % 16 spans dims 2g, 2g+1 — groups pairwise
    # orthogonal, cosine 0), rotated by angle = 50°*c + j° with class
    # c = (vec_id div 16) % 2 and jitter j = (vec_id div 32) % 5.
    # Within a (g, c) class all pairwise cosines are >= cos 4° ≈ 0.9976
    # (near-dups at threshold 0.99, NOT exact dups thanks to jitter);
    # across classes <= cos 46° ≈ 0.69; across groups exactly 0. With
    # the 16 plane axes as centroids every vector provably lands in its
    # own group's cluster, so the duplicate components are exactly the
    # (g, c) classes == vec_id % 32 — survivor = min id = the residue
    # itself, n_members and the survivor's centroid cosine (j = 0 →
    # cos(50°c)) all derivable by id arithmetic in the oracle.
    from dsgrid_spark.pipeline.similarity import semantic_dedup

    # ONE parsed SQL expression for the 32-element constructed vector
    # (the Column-API listcomp measured ~1 s of py4j round trips per
    # construction — the dedup SQL-twin pattern; values identical, same
    # arithmetic per element, oracle-gated)
    g = "CAST(vec_id % 16 AS INT)"
    c = "CAST((vec_id div 16) % 2 AS INT)"
    j = "CAST((vec_id div 32) % 5 AS INT)"
    angle = f"radians(50.0D * {c} + {j})"
    vec = F.expr("array(%s)" % ", ".join(
        f"CASE WHEN {p} = {g} * 2 THEN cos({angle}) "
        f"WHEN {p} = {g} * 2 + 1 THEN sin({angle}) "
        f"ELSE 0.0D END"
        for p in range(32)
    ))
    # 512 ids = 16 members per residue class at every sf — the operator
    # contract is fully exercised while the board slot's pair join stays
    # byte-bounded (scale behavior is the rehearsals' job, not the gate's)
    sem_corpus = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 512).select("vec_id", vec.alias("embedding"))
    axes = [[1.0 if i == 2 * gg else 0.0 for i in range(32)]
            for gg in range(16)]
    from dsgrid_spark.session import scoped_conf

    # the corpus is 512 rows by construction — semantic_dedup's
    # construction-time jobs (checkpoint, edge fetch) should not
    # schedule 32-task shuffles for it (measured 4.0 s -> 3.3 s at 8)
    with scoped_conf(spark, {"spark.sql.shuffle.partitions": "8"}):
        sem = semantic_dedup(sem_corpus, axes, threshold=0.99,
                             keep="min_id")
    return sem.select(
        F.lit("sem").alias("op"), F.col("id").alias("id_a"),
        F.col("n_members").cast("long").alias("id_b"),
        F.round("centroid_sim", 6).alias("score"))


def q44_embedding_neardup(spark, sf_dir):
    """Tagged union: 'pair' cosine near-dup pairs + 'sem' SemDeDup
    survivors (see the two sub-functions; bench.py times them
    separately because connected components inside semantic_dedup runs
    its convergence jobs at construction time, so a tag filter cannot
    prune the 'sem' subtree — the q28 'stream' convention)."""
    return _q44_pair(spark, sf_dir).unionByName(_q44_sem(spark, sf_dir))


def q45_similarity_ivf(spark, sf_dir):
    """IVF ANN + random projection (pipeline ops), tagged union.

    'ivf': n_probe == n_clusters makes the search exhaustive, so results
    are exact and the brute-force SQL oracle applies while the query
    still exercises the centroid-assignment + probe plumbing.

    'proj': JL ±1 sign projection 64→8 of integer-quantized vectors —
    the sign matrix derives from md5(seed:i,j) so DuckDB recomputes the
    exact matrix, and integer-valued inputs make the projection sums
    bit-exact in any summation order (the dimensionality-reduction step
    that runs BEFORE LSH/IVF at scale).

    'pq': product quantization (pipeline/pq.py) in its lossless audit
    regime — exact_codebooks makes encoding bit-faithful, so the ADC
    score IS the integer dot product and DuckDB recomputes the same
    top-5 from the quantized vectors directly.
    """
    from dsgrid_spark.pipeline.similarity import (
        ivf_topk, kmeans_centroids, random_projection,
    )

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    centroids = kmeans_centroids(emb, n_clusters=4, dim=64, iterations=2)
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, queries_df, centroids, k=5, n_probe=len(centroids))
    ivf = out.select(
        F.lit("ivf").alias("op"), "query_id", "vec_id",
        F.floor(F.col("score") * 1e6 + 0.5).cast("long").alias("score"))

    vq = emb.filter(F.col("vec_id") < 20).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("double"),
        ).alias("embedding"),
    )
    proj = random_projection(vq, dim=64, out_dim=8, seed="rp").select(
        F.lit("proj").alias("op"),
        F.col("vec_id").alias("query_id"),
        F.posexplode("projected").alias("vec_id", "val"),
    ).select("op", "query_id", "vec_id",
             F.col("val").cast("long").alias("score"))

    # 'pq': product quantization in its lossless audit regime — vectors
    # are integer-quantized (floor(x*2): 3 distinct values, so <=81
    # distinct 4-wide subvectors) and every distinct subvector is its
    # own codebook entry (exact_codebooks), making ip-ADC equal the
    # true integer dot product: the brute-force SQL oracle applies
    # while the query exercises the full encode -> LUT -> ADC plumbing.
    from dsgrid_spark.pipeline.pq import exact_codebooks, pq_encode, pq_topk

    vpq = emb.select(
        "vec_id",
        F.transform(F.col("embedding"),
                    lambda x: F.floor(x * 2).cast("double")).alias("embedding"),
    )
    books = exact_codebooks(vpq, dim=64, n_subvectors=16)
    pq_queries = vpq.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    pq = pq_topk(pq_encode(vpq, books), books, pq_queries, k=5).select(
        F.lit("pq").alias("op"), "query_id", "vec_id",
        F.floor(F.col("score") + 0.5).cast("long").alias("score"))

    # 'disk' (r8): the PERSISTED PQ index end-to-end — build to a temp
    # path (codes + vectors in cluster/batch-partitioned subtrees),
    # then the two-phase search: pruned code partitions -> ADC
    # shortlist -> exact re-rank reading only the shortlist's vectors.
    # Full probe + the lossless regime make the re-ranked dot equal
    # the 'pq' integers, so the same brute-force SQL oracle applies.
    import shutil
    import tempfile

    from dsgrid_spark.pipeline.pq import pq_search, write_pq_index

    tmp = tempfile.mkdtemp(prefix="dsgrid_q45_disk_")
    try:
        write_pq_index(vpq, f"{tmp}/idx", centroids, books)
        disk_queries = [(r["query_id"], list(r["embedding"]))
                        for r in pq_queries.collect()]
        disk = pq_search(spark, f"{tmp}/idx", disk_queries, k=5,
                         n_probe=len(centroids), shortlist=20).select(
            F.lit("disk").alias("op"),
            "query_id",
            F.col("id").alias("vec_id"),
            F.floor(F.col("score") + 0.5).cast("long").alias("score"),
        ).localCheckpoint()  # materialize before the index dir vanishes
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return ivf.unionByName(proj).unionByName(pq).unionByName(disk)


def q46_sample_and_cap(spark, sf_dir):
    """Deterministic content-hash sampling → per-group cap → sequence
    packing, plus token-weighted mixture sampling (pipeline ops), tagged
    union. 'pack' rows: same (key, salt) always lands on the same side
    of the cut regardless of cluster layout; at most N surviving docs
    per language in hash-of-key order; survivors pack into 5000-char
    training batches by running total. 'mix' rows: per-language keep
    fractions derived from target char-mass weights (binding group 'de'
    kept whole, 'zh' excluded from the mix). 'shuffle' rows: the
    deterministic sharded training-order permutation (shuffle_corpus),
    batch_index = shard*1e6 + shard_pos so the oracle pins the exact
    order, not just membership."""
    from dsgrid_spark.pipeline.sampling import (
        cap_per_group, chunk_token_stream, deterministic_sample,
        mixture_sample, pack_sequences, shuffle_corpus, stratified_sample,
        take_token_budget,
    )

    docs = _t(spark, sf_dir, "documents")
    sampled = deterministic_sample(docs, "doc_id", 0.3, salt="r2")
    capped = cap_per_group(sampled, ["lang"], "doc_id", 50)
    packed = pack_sequences(capped, ["lang"], "doc_id", "n_chars", 5000)
    pack_rows = packed.select(
        F.lit("pack").alias("op"), "doc_id", "lang", "source", "batch_index"
    )
    mix = mixture_sample(
        docs, "lang", {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.2},
        "doc_id", size_column="n_chars", salt="mix",
    )
    mix_rows = mix.select(
        F.lit("mix").alias("op"), "doc_id", "lang", "source",
        F.lit(-1).cast("long").alias("batch_index"),
    )
    strat = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.25},
                              "doc_id", default_fraction=0.1, salt="st")
    strat_rows = strat.select(
        F.lit("strat").alias("op"), "doc_id", "lang", "source",
        F.lit(-1).cast("long").alias("batch_index"),
    )
    # 'shuffle' rows: deterministic global training order — shard by one
    # md5 stream, order within shard by another; batch_index packs
    # (shard, shard_pos) into one long so the oracle checks the exact
    # permutation, not just membership. The 1e6 packing multiplier
    # bounds shard_pos < 1e6, i.e. corpora up to 7M docs at 7 shards —
    # sf100 (5M docs, ~714k/shard) fits; a larger rehearsal must widen
    # the multiplier on BOTH sides.
    # prune to the carried columns BEFORE the window shuffles: the text
    # column must never ride a training-order/packing exchange
    slim = docs.select("doc_id", "lang", "source", "n_chars")
    shuf = shuffle_corpus(slim, "doc_id", 7, salt="ep0")
    shuffle_rows = shuf.select(
        F.lit("shuffle").alias("op"), "doc_id", "lang", "source",
        (F.col("shard").cast("long") * F.lit(1000000)
         + F.col("shard_pos")).alias("batch_index"),
    )
    # 'chunks' rows: token-EXACT concat-and-chunk packing — each doc once
    # per 5000-char chunk it overlaps; batch_index packs
    # (chunk, tok_start, tok_end) so the oracle pins the exact spans.
    chunks = chunk_token_stream(slim, ["lang"], "doc_id", "n_chars", 5000,
                                salt="ck")
    chunk_rows = chunks.select(
        F.lit("chunks").alias("op"), "doc_id", "lang", "source",
        (F.col("chunk_index") * F.lit(100000000)
         + F.col("tok_start") * F.lit(10000)
         + F.col("tok_end")).cast("long").alias("batch_index"),
    )
    # 'budget' rows: the exact hash-order prefix that fills a 20000-char
    # budget (distributed prefix sum); batch_index = the global running
    # total itself, so the oracle verifies the prefix sums, not just
    # membership.
    took = take_token_budget(slim, "doc_id", "n_chars", 20000, n_shards=8,
                             salt="tb", keep_running_total=True)
    budget_rows = took.select(
        F.lit("budget").alias("op"), "doc_id", "lang", "source",
        F.col("running_total").alias("batch_index"),
    )
    # 'dsir' rows: hashed n-gram importance resampling toward the 'de'
    # slice (selection.dsir_select); batch_index carries the
    # Gumbel-perturbed integer score so the oracle pins the weights and
    # the exact resample, not just membership. Scores are exact integer
    # sums of bucket-level discretized log-ratios — the cross-engine
    # float risk is confined to the 10k-row bucket table.
    from dsgrid_spark.pipeline.selection import dsir_select

    sel = dsir_select(docs, docs.filter(F.col("lang") == "de"), k=100,
                      buckets=10_000, salt="dsir")
    dsir_rows = sel.select(
        F.lit("dsir").alias("op"), "doc_id", "lang", "source",
        F.col("gumbel_key").alias("batch_index"),
    )
    return (pack_rows.unionByName(mix_rows).unionByName(strat_rows)
            .unionByName(shuffle_rows).unionByName(chunk_rows)
            .unionByName(budget_rows).unionByName(dsir_rows))


def q47_fingerprint(spark, sf_dir):
    """Rolling-hash fingerprint duplicate-group sizes + TF-IDF top-terms
    (pipeline ops), tagged union.

    'fp' rows: the oracle can't reproduce xxhash64, so the check is on
    the grouping the fingerprint induces (copies-per-document via
    normalized text). 'term' rows: top-3 characteristic terms per doc
    under the integer-exact (tf desc, doc_freq asc, term) ordering so
    the oracle needs no float log."""
    from dsgrid_spark.pipeline.text import fingerprint, top_terms

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__fp", fingerprint(F.col("text"))
    )
    w_counts = docs.groupBy("__fp").agg(F.count("*").alias("n_copies"))
    fp_rows = docs.join(w_counts, "__fp").select(
        F.lit("fp").alias("op"), "doc_id", F.lit("").alias("term"),
        F.col("n_copies").alias("a"), F.lit(0).cast("long").alias("b"),
    )
    tt = top_terms(docs, "doc_id", "text", k=3, order="tf_rarity")
    term_rows = tt.select(
        F.lit("term").alias("op"), "doc_id", "term",
        F.col("tf").alias("a"), F.col("doc_freq").alias("b"),
    )

    # 'para' branch: C4-style corpus-global paragraph dedup. Every doc
    # becomes two paragraphs — its own text plus a per-source boilerplate
    # line — so the op must (a) keep each distinct text paragraph only in
    # its min-id document and (b) keep each source's boilerplate exactly
    # once, in that source's min-id document. term = md5 of the kept
    # paragraph (computable identically in DuckDB), a = position,
    # b = the doc's paragraph count.
    from dsgrid_spark.pipeline.dedup import dedup_paragraphs

    two_para = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n\n", F.col("text"),
            F.concat(F.lit("boilerplate for "), F.col("source")),
        ).alias("text"),
    )
    para_rows = dedup_paragraphs(two_para).select(
        F.lit("para").alias("op"), "doc_id",
        F.md5("paragraph").alias("term"),
        F.col("pos").cast("long").alias("a"),
        F.col("n_paras").cast("long").alias("b"),
    )

    # 'fuzzpara' branch: NEAR-dup paragraph removal on a CONSTRUCTED
    # corpus whose fuzzy survivor set is provable (the q31 pattern —
    # VERDICT r5 item 5). Each doc = a body of 10 doc-unique tokens
    # (pairwise shingle-Jaccard 0) + an 11-token templated footer whose
    # trailing token is g{doc_id % 4}: any two footer variants share 8 of
    # 10 3-shingles (J = 0.8 exactly), so at threshold 0.7 every footer
    # has every earlier footer as a verified neighbor and ONLY the global
    # min-doc_id footer survives; same-variant footers are exact dups and
    # collapse in the exact pre-pass. num_bands == num_hashes gives
    # 1-row bands (per-band match prob = J = 0.8; miss-all prob 0.2^24
    # ~ 3e-17 per pair — and deterministic under the fixed hash seed).
    from dsgrid_spark.pipeline.dedup import dedup_paragraphs_fuzzy

    body = F.concat_ws(" ", *[
        F.concat(F.lit("b"), F.col("doc_id").cast("string"), F.lit(c))
        for c in "abcdefghij"
    ])
    footer = F.concat(
        F.lit("copyright example corp all rights reserved contact the "
              "main office g"),
        (F.col("doc_id") % 4).cast("string"),
    )
    fuzz_docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws("\n\n", body, footer).alias("text"))
    fuzz_rows = dedup_paragraphs_fuzzy(
        fuzz_docs, num_hashes=24, num_bands=24, shingle_k=3, threshold=0.7
    ).select(
        F.lit("fuzzpara").alias("op"), "doc_id",
        F.md5("paragraph").alias("term"),
        F.col("pos").cast("long").alias("a"),
        F.col("n_paras").cast("long").alias("b"),
    )
    # 'span' branch: exact duplicate-substring removal (Lee et al.
    # ACL'22 ExactSubstr) on a constructed provable corpus — every doc
    # is 120 doc-unique tokens plus the SAME 60-token run, so windows
    # fully inside the run (starts 120..130 at L=50, covering exactly
    # tokens 120-179) are duplicated while boundary-spanning windows
    # differ per doc. Expected: the global min-id doc keeps all 180
    # tokens; every other doc loses exactly the 60-token suffix. The
    # oracle rebuilds the expected kept text from doc_id arithmetic.
    from dsgrid_spark.pipeline.dedup import dedup_substrings

    span_text = F.concat_ws(" ", F.concat_ws(" ", *[
        F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                 F.lit(f"t{j}")) for j in range(120)
    ]), F.lit(" ".join(f"s{j}" for j in range(60))))
    span_docs = _t(spark, sf_dir, "documents").select("doc_id",
                                                      span_text.alias("text"))
    span_rows = dedup_substrings(span_docs, window_tokens=50).select(
        F.lit("span").alias("op"), "doc_id",
        F.md5("text").alias("term"),
        F.col("n_tokens_kept").alias("a"),
        F.col("n_tokens_dropped").alias("b"),
    )
    # 'hh' branch: corpus-wide heavy-hitter trigrams (boilerplate
    # audit) — doc_id carries the 1-based rank, a the count, b the
    # n-gram order; total order (count desc, trigram asc) makes the
    # top-20 deterministic on both engines.
    from dsgrid_spark.pipeline.text import top_ngrams

    hh_rows = top_ngrams(
        _t(spark, sf_dir, "documents"), "text", n=3, k=20
    ).select(
        F.lit("hh").alias("op"), F.col("rank").alias("doc_id"),
        F.col("ngram").alias("term"), F.col("count").alias("a"),
        F.lit(3).cast("long").alias("b"),
    )
    # 'ahh' branch: the BOUNDED-STATE heavy hitter must equal the exact
    # one — the oracle is the same top-20 SQL. capacity=16384 makes the
    # Misra-Gries exactness bound hold on this corpus at every sf
    # (measured max N/f20 = 11,850 at sf0.1 < capacity+1), so equality
    # is a guarantee, not luck.
    from dsgrid_spark.pipeline.text import approx_top_ngrams

    ahh_rows = approx_top_ngrams(
        _t(spark, sf_dir, "documents"), "text", n=3, k=20, capacity=16384
    ).select(
        F.lit("ahh").alias("op"), F.col("rank").alias("doc_id"),
        F.col("ngram").alias("term"), F.col("count").alias("a"),
        F.lit(3).cast("long").alias("b"),
    )
    return (fp_rows.unionByName(term_rows).unionByName(para_rows)
            .unionByName(fuzz_rows).unionByName(span_rows)
            .unionByName(hh_rows).unionByName(ahh_rows))


def q48_supplemental_filter(spark, sf_dir):
    """Supplemental-dimension filter: base records translated through a
    mapping table then semi-joined (SURVEY §2.2)."""
    from dsgrid_spark.operators.filters import SupplementalMappingFilter

    customer = _t(spark, sf_dir, "customer").withColumn(
        "geography", F.col("c_nationkey").cast("string")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    mapping = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").cast("string").alias("from_id"),
        F.col("r_name").alias("to_id"),
    )
    filt = SupplementalMappingFilter(
        column="geography", supplemental_ids=["ASIA", "EUROPE"]
    )
    out = filt.apply_with_mapping(customer, mapping)
    return out.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
    )


def q49_add_name_column(spark, sf_dir):
    """Attach a record attribute (id -> name) via broadcast join, keeping
    both columns (SURVEY §2.12 replace-ids-with-names / add-supplemental-
    column)."""
    from dsgrid_spark.operators.mapping import add_column_from_records

    ev = _t(spark, sf_dir, "events").withColumn(
        "geography", (F.col("user_id") % 4).cast("string")
    )
    records = spark.createDataFrame(
        [("0", "north"), ("1", "south"), ("2", "east"), ("3", "west")],
        "id string, name string",
    )
    out = add_column_from_records(ev, records, "geography",
                                  records_key="id", records_value="name",
                                  new_column="geography_name")
    return out.groupBy("geography", "geography_name").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("value"),
    )


def _hourly_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("hour", "ts").alias("ts")).agg(
        F.sum("value").alias("value")
    )


def q50_dst_duplicate(spark, sf_dir, branch=None):
    """DST adjustments (SURVEY §2.10), tagged union. 'spring'/'fall' =
    drop spring-forward hour, duplicate fall-back hour; 'interp' = the
    duplicated fall-back hour gets the mean of its neighbors. Events
    (Jan 2024) shifted onto the 2024 US DST dates.

    ``branch`` (bench-only; the driver always passes None) constructs
    ONLY the named child's plan — the q30/q32 per-branch-plan
    convention (r12). Valid because the drop/duplicate adjustment is
    pure per-row column math and the interpolation join keys on every
    non-value column (the tag included), so
    adjust(spring ∪ fall) filtered to one tag == adjust(that child)."""
    from dsgrid_spark.dimensions import DaylightSavingAdjustmentType
    from dsgrid_spark.timedim.conversion import adjust_daylight_saving

    hourly = _hourly_events(spark, sf_dir)
    if branch in (None, "spring"):
        spring = hourly.select(
            F.lit("spring").alias("tag"),
            (F.col("ts") + F.expr("INTERVAL 69 DAYS")).alias("ts"), "value",
        )
    fall = hourly.select(
        F.lit("fall").alias("tag"),
        (F.col("ts") + F.expr("INTERVAL 307 DAYS")).alias("ts"), "value",
    )
    if branch in (None, "spring", "fall"):
        dup_in = (spring.unionByName(fall) if branch is None
                  else (spring if branch == "spring" else fall))
        dup = adjust_daylight_saving(
            dup_in, "ts",
            DaylightSavingAdjustmentType
            .DROP_SPRING_FORWARD_DUPLICATE_FALLBACK,
            "America/Denver",
        ).select(
            "tag", F.date_format("ts", TS_FMT).alias("local_ts"),
            F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value"),
        )
        if branch in ("spring", "fall"):
            return dup
    interp = adjust_daylight_saving(
        fall.select("ts", "value"), "ts",
        DaylightSavingAdjustmentType.DROP_SPRING_FORWARD_INTERPOLATE_FALLBACK,
        "America/Denver",
    ).select(
        F.lit("interp").alias("tag"),
        F.date_format("ts", TS_FMT).alias("local_ts"),
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value"),
    )
    if branch == "interp":
        return interp
    return dup.unionByName(interp)


def q05_project_query(spark, sf_dir):
    """Full query lifecycle through Catalog + QuerySubmitter (SURVEY §3.1):
    register dataset/mapping, supplemental prefilter resolved BY NAME
    through the ProjectConfig (reference dsgrid/project.py:205-250),
    broadcast map-join, fraction collapse, result aggregation + sort."""
    from dsgrid_spark.operators.filters import NamedDimensionFilter
    from dsgrid_spark.query.models import (
        DatasetModel, MappingSpec, ProjectQueryModel, ResultModel,
    )
    from dsgrid_spark.query.project import (
        ProjectConfig, SupplementalDimensionModel,
    )
    from dsgrid_spark.query.submitter import QuerySubmitter
    from dsgrid_spark.sources.catalog import Catalog

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    fact = customer.join(orders, customer.c_custkey == orders.o_custkey).select(
        F.col("c_nationkey").cast("string").alias("geography"),
        F.year("o_orderdate").cast("string").alias("model_year"),
        F.col("o_totalprice").alias("value"),
    )
    mapping = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").cast("string").alias("from_id"),
        F.col("r_name").alias("to_id"),
        F.lit(1.0).alias("from_fraction"),
    )
    catalog = Catalog(spark)
    catalog.register_dataset("sales", fact)
    catalog.register_mapping("nation_to_region", mapping)
    project = ProjectConfig(
        project_id="tpch",
        base_dimensions={"geography": "nation"},
        supplemental_dimensions=[SupplementalDimensionModel(
            name="region", dimension_type="geography",
            mapping="nation_to_region")],
    )

    query = ProjectQueryModel(
        name="regional_sales",
        source_datasets=[DatasetModel(
            dataset_id="sales",
            mappings=[MappingSpec(dimension="geography",
                                  mapping="nation_to_region")],
            filters=[NamedDimensionFilter(
                dimension_name="region",
                record_ids=["ASIA", "AMERICA"],
            )],
        )],
        result=ResultModel(
            aggregations=[AggregationModel(
                group_by_columns=[ColumnModel(dimension_name="geography"),
                                  ColumnModel(dimension_name="model_year")],
                aggregation_function="sum",
            )],
            sort_columns=["geography", "model_year"],
        ),
    )
    out = QuerySubmitter(catalog, project=project).submit(query)
    return out.select("geography", "model_year",
                      F.round("value", 2).alias("value"))


def q38_video_frame_sampling(spark, sf_dir):
    """Multimodal frame-sampling fan-out + document chunking (pipeline
    ops), tagged union — both are shuffle-free sequence+explode fan-outs.
    'chunk' rows carry an md5 prefix of each chunk's text so the oracle
    verifies chunk CONTENT (boundaries + overlap), not just counts."""
    from dsgrid_spark.pipeline.multimodal import sample_video_frames
    from dsgrid_spark.pipeline.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    videos = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 300 + 1).cast("int").alias("n_frames"),
    )
    out = sample_video_frames(videos, every_n=30)
    frame_rows = out.select(
        F.lit("frame").alias("op"), "media_id",
        F.col("n_frames").alias("n"), F.col("frame_index").alias("idx"),
        F.lit("").alias("h"),
    )
    chunks = chunk_documents(docs.select("doc_id", "text"), "doc_id",
                             "text", chunk_chars=500, overlap=50)
    chunk_rows = chunks.select(
        F.lit("chunk").alias("op"), F.col("doc_id").alias("media_id"),
        F.col("n_chunks").alias("n"), F.col("chunk_index").alias("idx"),
        F.substring(F.md5("chunk_text"), 1, 8).alias("h"),
    )
    return frame_rows.unionByName(chunk_rows)


def q08_subset_supplemental(spark, sf_dir):
    """Project-config name resolution (SURVEY §2.2/§2.12): a subset
    dimension filters base records and a supplemental dimension is the
    aggregation target — the query names ONLY dimension names; the
    ProjectConfig supplies record ids and the base→supplemental mapping
    (reference dsgrid/project.py:205-250, project_config.py categories)."""
    from dsgrid_spark.operators.filters import NamedDimensionFilter
    from dsgrid_spark.query.models import (
        DatasetModel, ProjectQueryModel, ResultModel,
    )
    from dsgrid_spark.query.project import (
        ProjectConfig, SubsetDimensionModel, SupplementalDimensionModel,
    )
    from dsgrid_spark.query.submitter import QuerySubmitter
    from dsgrid_spark.sources.catalog import Catalog
    from dsgrid_spark.operators.aggregation import AggregationModel, ColumnModel

    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("string").alias("geography"),
        F.col("c_mktsegment").alias("sector"),
        F.col("c_acctbal").alias("value"),
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    mapping = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").cast("string").alias("from_id"),
        F.col("r_name").alias("to_id"),
        F.lit(1.0).alias("from_fraction"),
    )
    catalog = Catalog(spark)
    catalog.register_dataset("balances", customer)
    catalog.register_mapping("nation_to_region", mapping)
    project = ProjectConfig(
        project_id="tpch",
        base_dimensions={"geography": "nation"},
        subset_dimensions=[SubsetDimensionModel(
            name="first_ten_nations", dimension_type="geography",
            record_ids=[str(i) for i in range(10)])],
        supplemental_dimensions=[SupplementalDimensionModel(
            name="region", dimension_type="geography",
            mapping="nation_to_region")],
    )
    query = ProjectQueryModel(
        name="subset_supplemental",
        source_datasets=[DatasetModel(dataset_id="balances")],
        result=ResultModel(
            filters=[NamedDimensionFilter(dimension_name="first_ten_nations")],
            aggregations=[AggregationModel(
                group_by_columns=[ColumnModel(dimension_name="region"),
                                  ColumnModel(dimension_name="sector")],
                aggregation_function="sum")],
        ),
    )
    out = QuerySubmitter(catalog, project=project).submit(query)
    return out.select("region", "sector", F.round("value", 2).alias("value"))


def q26_external_tz(spark, sf_dir):
    """DATETIME_EXTERNAL_TZ load (SURVEY §2.10 long tail): tz-naive
    wall-clock timestamps localized through each geography's IANA zone
    into absolute time — one per-row to_utc_timestamp expression
    (reference dimensions.py:746-790, aligned_in_clock_time)."""
    from dsgrid_spark.timedim.external import localize_external_tz

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.date_trunc("hour", "ts").alias("timestamp"),
        (F.col("user_id") % 2).cast("string").alias("geography"),
        "value",
    )
    geo = spark.createDataFrame(
        [("0", "Etc/GMT+6"), ("1", "Etc/GMT+7")], "id string, time_zone string"
    )
    out = localize_external_tz(ev, "timestamp", geography_records=geo)
    return out.select(
        "event_id", "geography",
        F.date_format("timestamp", TS_FMT).alias("utc_hour"),
        "value",
    )


def q35_period_ending_daily(spark, sf_dir):
    """period_ending → period_beginning relabel, then daily TOTAL
    downsample (SURVEY §2.10 long tail; reference
    dsgrid/dimension/time.py:95-116 interval semantics)."""
    from dsgrid_spark.dimensions import MeasurementType, TimeIntervalType
    from dsgrid_spark.timedim.conversion import (
        convert_time_interval, downsample,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("timestamp"),
        (F.col("user_id") % 4).cast("string").alias("geography"),
        # per-row micro-units: integer-valued doubles sum exactly in any
        # order (the q21/q23 determinism rule)
        F.floor(F.col("value") * 1e6 + 0.5).cast("double").alias("value"),
    )
    pb = convert_time_interval(ev, "timestamp",
                               TimeIntervalType.PERIOD_ENDING,
                               TimeIntervalType.PERIOD_BEGINNING, 3600)
    daily = downsample(pb, "timestamp", 86400, MeasurementType.TOTAL)
    return daily.select(
        F.date_format("timestamp", TS_FMT).alias("day"),
        "geography", F.col("value").cast("long").alias("value"),
    )


def q17_expression_extended(spark, sf_dir):
    """Extended dataset-expression surface (SURVEY §2.9; reference
    py_expression_eval ops :352-420): % ** comparisons as masks —
    ``(a * (a > b) + b * (a <= b)) % c`` = elementwise max(a,b) mod c."""
    orders = _t(spark, sf_dir, "orders")
    # per-row integer discretization (cents), not float sums: the % c
    # step keeps the ABSOLUTE last-ULP delta of a cross-engine float-sum
    # order difference, so at sf100 (3e12 sums) round(fmod) diverged by
    # 0.1 — integer cents are exact and associative at every scale
    cents = F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                  .cast("long")).alias("value")
    a = (orders.filter(F.year("o_orderdate") <= 1996)
         .groupBy("o_orderpriority").agg(cents))
    b = (orders.filter(F.year("o_orderdate") > 1996)
         .groupBy("o_orderpriority").agg(cents))
    c = orders.groupBy("o_orderpriority").agg(
        F.lit(100000).cast("long").alias("value")
    )
    out = evaluate_expression("(a * (a > b) + b * (a <= b)) % c",
                              {"a": a, "b": b, "c": c})
    return out.select("o_orderpriority",
                      F.col("value").cast("long").alias("value"))


def q39_embedding_centroids(spark, sf_dir):
    """Tagged union: 'centroid' = element-wise mean embedding per label
    (posexplode + partial-agg groupBy — shuffle carries only groups x
    dim partial sums); 'quant' = symmetric int8 quantization of a
    vector subset (per-row array HOFs, zero shuffle)."""
    from dsgrid_spark.pipeline.similarity import (
        embedding_centroids, quantize_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    # integer micro-units via floor, not round(value, 6): Spark (BigDecimal
    # HALF_UP) and DuckDB (float multiply-round) round doubles differently at
    # 1e-6 boundaries — the q29 lesson, third occurrence. floor(x*1e6) is the
    # same IEEE ops on both engines for identical x.
    cent = embedding_centroids(emb, ["label"]).select(
        F.lit("centroid").alias("op"),
        F.col("label").cast("long").alias("gid"),
        "pos",
        F.floor(F.col("value") * 1e6 + 0.5).cast("long").alias("value"),
    )
    quant = quantize_embeddings(emb.filter(F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("gid"),
        F.posexplode("qvec").alias("pos", "qv"),
    ).select(
        F.lit("quant").alias("op"), "gid", "pos",
        F.col("qv").cast("long").alias("value"),
    )
    return cent.unionByName(quant)


def q11_aggregate_each_dataset(spark, sf_dir):
    """aggregate_each_dataset lifecycle (reference
    query_submitter.py:508-516): filters+aggregations run per dataset and
    are NOT re-applied post-union — per-dataset means stay separate rows."""
    from dsgrid_spark.query.models import (
        DatasetModel, ProjectQueryModel, ResultModel,
    )
    from dsgrid_spark.query.submitter import QuerySubmitter
    from dsgrid_spark.sources.catalog import Catalog

    orders = _t(spark, sf_dir, "orders")
    early = orders.filter(F.year("o_orderdate") <= 1996).select(
        "o_orderpriority", F.lit("early").alias("era"),
        F.col("o_totalprice").alias("value"))
    late = orders.filter(F.year("o_orderdate") > 1996).select(
        "o_orderpriority", F.lit("late").alias("era"),
        F.col("o_totalprice").alias("value"))
    cat = Catalog(spark)
    cat.register_dataset("early", early)
    cat.register_dataset("late", late)
    q = ProjectQueryModel(
        name="per_ds",
        source_datasets=[DatasetModel(dataset_id="early"),
                         DatasetModel(dataset_id="late")],
        aggregate_each_dataset=True,
        result=ResultModel(aggregations=[AggregationModel(
            group_by_columns=[ColumnModel(dimension_name="o_orderpriority"),
                              ColumnModel(dimension_name="era")],
            aggregation_function="avg")]),
    )
    out = QuerySubmitter(cat).submit(q)
    # integer floor, not round-to-4: cross-engine avg differs in the
    # last ULP and 1e-4-spaced round boundaries are too tight (q29 lesson)
    return out.select("o_orderpriority", "era",
                      F.floor("value").cast("long").alias("value"))


def q13_composite_dataset(spark, sf_dir):
    """Lifecycle C (reference query_submitter.py:730-811): materialize a
    combined table as a composite dataset, then re-query it with only a
    result phase."""
    import tempfile

    from dsgrid_spark.query.models import (
        DatasetModel, ProjectQueryModel, ResultModel,
    )
    from dsgrid_spark.query.submitter import QuerySubmitter
    from dsgrid_spark.sources.catalog import Catalog

    # integer cents as double: exact, order-independent sums through BOTH
    # lifecycle aggregations (sf10 totals ~1.2e14 cents, far under 2^53) —
    # round(sum(float), 2) differed from DuckDB by a last cent at sf10
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("double")
        .alias("value"))
    cat = Catalog(spark)
    cat.register_dataset("orders_fact", orders)
    sub = QuerySubmitter(cat, output_dir=tempfile.mkdtemp(prefix="dsgrid_q13_"))
    sub.create_composite_dataset(ProjectQueryModel(
        name="by_prio_status",
        source_datasets=[DatasetModel(dataset_id="orders_fact")],
        result=ResultModel(aggregations=[AggregationModel(
            group_by_columns=[ColumnModel(dimension_name="o_orderpriority"),
                              ColumnModel(dimension_name="o_orderstatus")],
            aggregation_function="sum")]),
    ), dataset_id="prio_status")
    out = sub.submit_composite("prio_status", ResultModel(
        aggregations=[AggregationModel(
            group_by_columns=[ColumnModel(dimension_name="o_orderstatus")],
            aggregation_function="sum")]))
    return out.select("o_orderstatus",
                      F.col("value").cast("long").alias("value_cents"))


def q16_dataset_query_chain(spark, sf_dir):
    """Lifecycle B (reference query_submitter.py:837-989): map one dataset
    to a target dimension, auto-resolving a TWO-hop mapping chain
    (nation -> region -> zone) through the registry mapping graph."""
    from dsgrid_spark.query.submitter import QuerySubmitter
    from dsgrid_spark.sources.catalog import Catalog

    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("string").alias("geography"),
        F.col("c_acctbal").alias("value"))
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    n2r = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").cast("string").alias("from_id"),
        F.col("r_name").alias("to_id"), F.lit(1.0).alias("from_fraction"))
    r2z = spark.createDataFrame(
        [("AFRICA", "east"), ("ASIA", "east"), ("MIDDLE EAST", "east"),
         ("AMERICA", "west"), ("EUROPE", "west")],
        "from_id string, to_id string",
    ).withColumn("from_fraction", F.lit(1.0))
    cat = Catalog(spark)
    cat.register_dataset("balances", customer)
    cat.register_mapping("nation_to_region", n2r,
                         from_dimension="nation", to_dimension="region")
    cat.register_mapping("region_to_zone", r2z,
                         from_dimension="region", to_dimension="zone")
    out = QuerySubmitter(cat).submit_dataset_query(
        "balances", from_dimension="nation", to_dimension="zone",
        dimension_column="geography")
    return out.groupBy("geography").agg(
        F.round(F.sum("value"), 2).alias("value"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_scan_projection": q02_scan_projection,
        "q03_filter_ops": q03_filter_ops,
        "q04_filter_subset": q04_filter_subset,
        "q05_project_query": q05_project_query,
        "q06_join_multi": q06_join_multi,
        "q07_map_dimension": q07_map_dimension,
        "q08_subset_supplemental": q08_subset_supplemental,
        "q09_two_table": q09_two_table,
        "q10_agg_chained": q10_agg_chained,
        "q11_aggregate_each_dataset": q11_aggregate_each_dataset,
        "q12_peak_load": q12_peak_load,
        "q13_composite_dataset": q13_composite_dataset,
        "q14_sort_limit": q14_sort_limit,
        "q15_union": q15_union,
        "q16_dataset_query_chain": q16_dataset_query_chain,
        "q17_expression_extended": q17_expression_extended,
        "q18_arith_expression": q18_arith_expression,
        "q19_pivot": q19_pivot,
        "q20_unpivot": q20_unpivot,
        "q21_scalar_datetime": q21_scalar_datetime,
        "q22_unit_conversion": q22_unit_conversion,
        "q23_time_downsample": q23_time_downsample,
        "q24_annual_to_hourly": q24_annual_to_hourly,
        "q25_tz_convert": q25_tz_convert,
        "q26_external_tz": q26_external_tz,
        "q27_growth_exponential": q27_growth_exponential,
        "q28_dedup_exact": q28_dedup_exact,
        "q29_text_stats": q29_text_stats,
        "q30_minhash_dedup": q30_minhash_dedup,
        "q31_simhash_dedup": q31_simhash_dedup,
        "q32_similarity_bruteforce": q32_similarity_bruteforce,
        "q33_similarity_lsh": q33_similarity_lsh,
        "q34_multimodal_features": q34_multimodal_features,
        "q35_period_ending_daily": q35_period_ending_daily,
        "q36_index_time": q36_index_time,
        "q37_leap_day": q37_leap_day,
        "q38_video_frame_sampling": q38_video_frame_sampling,
        "q39_embedding_centroids": q39_embedding_centroids,
        "q40_pivoted_load": q40_pivoted_load,
        "q41_representative_time": q41_representative_time,
        "q42_language_id": q42_language_id,
        "q43_ngram_jaccard": q43_ngram_jaccard,
        "q44_embedding_neardup": q44_embedding_neardup,
        "q45_similarity_ivf": q45_similarity_ivf,
        "q46_sample_and_cap": q46_sample_and_cap,
        "q47_fingerprint": q47_fingerprint,
        "q48_supplemental_filter": q48_supplemental_filter,
        "q49_add_name_column": q49_add_name_column,
        "q50_dst_duplicate": q50_dst_duplicate,
    }


_NORM_TEXT = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

# mirror of dsgrid_spark.pipeline.text._LANG_MARKERS and the case-ladder
# priority (en > es > fr > de on score ties)
_LANG_MARKERS_SQL = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "se", "un"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
}


def _lang_score_sql(lang: str) -> str:
    return " + ".join(
        f"CAST(regexp_matches(lower(text), '\\b{w}\\b') AS INT)"
        for w in _LANG_MARKERS_SQL[lang]
    )


_LANG_ID_SQL = f"""
    WITH scored AS (
      SELECT doc_id, text,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr,
             {_lang_score_sql('de')} AS s_de
      FROM documents
    ), metrics AS (
      SELECT doc_id,
             len(text) AS n,
             CASE
               WHEN s_en = greatest(s_en, s_es, s_fr, s_de) AND s_en > 0 THEN 'en'
               WHEN s_es = greatest(s_en, s_es, s_fr, s_de) AND s_es > 0 THEN 'es'
               WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) AND s_fr > 0 THEN 'fr'
               WHEN s_de = greatest(s_en, s_es, s_fr, s_de) AND s_de > 0 THEN 'de'
               ELSE 'und'
             END AS lang_pred,
             CAST(floor((
                 least(1.0, len(text) / 500.0)
                 + CASE WHEN len(text) > 0 THEN
                     len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0
                     / len(text)
                   ELSE 0.0 END
                 + s_en / 8.0
             ) / 3.0 * 1e6 + 0.5) AS BIGINT) AS quality,
             CASE WHEN len(ws) > 0 THEN
               CAST(floor((len(ws) - len(list_distinct(ws))) * 1000000.0
                          / len(ws)) AS BIGINT)
             ELSE 0 END AS dup_word_ppm,
             CASE WHEN len(ws) >= 2 THEN
               CAST(floor(list_max(list_transform(list_distinct(bgs),
                      d -> len(list_filter(bgs, x -> x = d)))) * 1000000.0
                          / (len(ws) - 1)) AS BIGINT)
             ELSE 0 END AS top_bigram_ppm,
             CAST(floor(CASE WHEN len(text) > 0 THEN
               len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000.0
               / len(text) ELSE 0.0 END) AS BIGINT) AS alpha_ppm
      FROM (
        SELECT *, list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i+1]) AS bgs
        FROM (
          SELECT *, string_split_regex(trim(text), '\\s+') AS ws FROM scored
        )
      )
    )
    SELECT 'doc' AS op, doc_id, lang_pred, quality, dup_word_ppm,
           top_bigram_ppm
    FROM metrics
    UNION ALL
    SELECT 'funnel',
           CAST(CASE rule WHEN 'short' THEN 0 WHEN 'nonalpha' THEN 1
                          WHEN 'repetitive' THEN 2 WHEN 'lang' THEN 3
                          ELSE 4 END AS BIGINT),
           rule, count(*), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM (
      SELECT CASE WHEN NOT (n >= 200) THEN 'short'
                  WHEN NOT (alpha_ppm >= 800000) THEN 'nonalpha'
                  WHEN NOT (dup_word_ppm < 400000) THEN 'repetitive'
                  WHEN NOT (lang_pred <> 'und') THEN 'lang'
                  ELSE 'kept' END AS rule
      FROM metrics
    )
    GROUP BY rule
    UNION ALL
    SELECT 'clf', doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'spam' ELSE 'ham' END,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT),
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT),
           CAST(0 AS BIGINT)
    FROM documents WHERE doc_id < 200
"""


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS sum_base_price_cents,
                   CAST(floor(avg(l_discount) * 1e6 + 0.5) AS BIGINT) AS avg_disc_micro,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_scan_projection": r"""
            WITH aug AS (
              SELECT doc_id,
                     concat(text, ' see https://sub', doc_id % 5,
                            '.site', doc_id % 7, '.com/d/', doc_id,
                            ' or mail user', doc_id, '@test.org now ip 10.0.',
                            doc_id % 256, '.7 call +1555', doc_id,
                            ' card 4111111111111111 ok') AS text
              FROM documents WHERE doc_id < 400
            )
            SELECT doc_id,
                   len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
                   len(regexp_extract_all(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                   len(trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(text, 'https?://[^\s]+', ' ', 'g'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g'),
                     '\s+', ' ', 'g'))) AS n_chars_clean,
                   len(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(
                             regexp_replace(text,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                             'https?://[^\s]+', '<URL>', 'g'),
                           '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                         '\+\d{7,15}\b', '<PHONE>', 'g'),
                       '\b\d{13,19}\b', '<NUM>', 'g')
                   ) AS n_chars_redacted,
                   concat('site', doc_id % 7, '.com') AS domain,
                   CASE WHEN doc_id % 7 IN (0, 3)
                        THEN 1 ELSE 0 END AS blocked
            FROM aug
        """,
        "q03_filter_ops": """
            SELECT p_partkey, p_name, p_brand, p_type, p_size
            FROM part
            WHERE p_type LIKE 'PROMO%'
              AND p_size BETWEEN 1 AND 15
              AND p_brand NOT IN ('Brand#45')
              AND p_retailprice < 960.0
        """,
        "q04_filter_subset": """
            SELECT 'subset' AS mode, l_returnflag AS grp, count(*) AS n_rows,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
            GROUP BY l_returnflag
            UNION ALL
            SELECT 'anti', c_mktsegment, count(*), 0.0
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment
        """,
        "q06_join_multi": """
            SELECT 'multi' AS op, r_name AS k, count(*) AS n,
                   round(sum(c_acctbal), 2) AS value
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
            UNION ALL
            SELECT 'asof' AS op, CAST(e.user_id AS VARCHAR) AS k,
                   count(*) AS n,
                   CAST(floor(sum(e.value * r.rate) * 1e6 + 0.5) AS DOUBLE) AS value
            FROM events e ASOF JOIN (
              SELECT user_id,
                     TIMESTAMP '2024-01-01' + to_days(7 * CAST(k AS INT))
                       AS valid_from,
                     ((user_id * 7 + k) % 100) / 10.0 AS rate
              FROM (SELECT DISTINCT user_id FROM events),
                   (SELECT unnest(range(5)) AS k)
            ) r ON e.user_id = r.user_id AND e.ts >= r.valid_from
            GROUP BY 1, 2
            UNION ALL
            SELECT 'asof_fwd' AS op, CAST(user_id AS VARCHAR) AS k,
                   count(*) AS n,
                   CAST(floor(sum(value * rate) * 1e6 + 0.5) AS DOUBLE) AS value
            FROM (
              SELECT e.user_id, e.value,
                     (SELECT r.rate FROM (
                        SELECT user_id,
                               TIMESTAMP '2024-01-01'
                                 + to_days(7 * CAST(k AS INT)) AS valid_from,
                               ((user_id * 7 + k) % 100) / 10.0 AS rate
                        FROM (SELECT DISTINCT user_id FROM events),
                             (SELECT unnest(range(5)) AS k)
                      ) r
                      WHERE r.user_id = e.user_id AND r.valid_from >= e.ts
                      ORDER BY r.valid_from ASC LIMIT 1) AS rate
              FROM events e
            )
            WHERE rate IS NOT NULL
            GROUP BY 1, 2
            UNION ALL
            SELECT 'range' AS op, CAST(window_id AS VARCHAR) AS k,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                     AS value
            FROM events e JOIN (
              SELECT w AS window_id,
                     TIMESTAMP '2024-01-01' + to_days(3 * CAST(w AS INT))
                       AS w_start,
                     TIMESTAMP '2024-01-01' + to_days(3 * CAST(w AS INT))
                       + to_hours(6) AS w_end
              FROM (SELECT unnest(range(10)) AS w)
            ) ON e.ts >= w_start AND e.ts < w_end
            GROUP BY 1, 2
        """,
        "q07_map_dimension": """
            SELECT 'agg' AS mode, n.n_name AS geography,
                   round(sum(c.c_acctbal * 1.0), 2) AS value
            FROM customer c JOIN nation n ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
            GROUP BY n.n_name
            UNION ALL
            SELECT 'disagg', to_id, value FROM (
              WITH totals AS (
                SELECT CAST(n_regionkey AS VARCHAR) AS geography,
                       sum(c_acctbal) AS value
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                GROUP BY CAST(n_regionkey AS VARCHAR)
              ), m AS (
                SELECT CAST(n_regionkey AS VARCHAR) AS from_id, n_name AS to_id,
                       1.0 / count(*) OVER (PARTITION BY n_regionkey) AS frac
                FROM nation
              )
              SELECT m.to_id AS to_id,
                     CAST(floor(sum(t.value * m.frac) * 1e6 + 0.5) AS DOUBLE) AS value
              FROM totals t JOIN m ON t.geography = m.from_id
              GROUP BY m.to_id
            )
        """,
        "q09_two_table": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS sum_value_cents,
                   count(*) AS n_rows
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus, o_orderpriority
        """,
        "q10_agg_chained": """
            WITH hourly AS (
              SELECT event_type, extract(hour FROM ts) AS hour,
                     sum(value) AS value
              FROM events GROUP BY event_type, extract(hour FROM ts)
            ), diurnal AS (
              SELECT event_type, round(avg(value), 2) AS avg_hourly_value
              FROM hourly GROUP BY event_type
            ), d AS (
              SELECT event_type, count(DISTINCT user_id) AS n_users,
                     count(*) AS n_events
              FROM events GROUP BY event_type
            ), pct AS (
              SELECT event_type,
                     CAST(floor(quantile_cont(value, 0.5) * 1e6 + 0.5) AS BIGINT)
                       AS p50_value,
                     CAST(floor(quantile_cont(value, 0.9) * 1e6 + 0.5) AS BIGINT)
                       AS p90_value
              FROM events GROUP BY event_type
            ), outl AS (
              SELECT event_type,
                     count(*) FILTER (abs(value - mu) > 2.0 * sigma)
                       AS n_outliers
              FROM (
                SELECT event_type, value,
                       avg(value) OVER (PARTITION BY event_type) AS mu,
                       stddev_samp(value) OVER (PARTITION BY event_type)
                         AS sigma
                FROM events
              ) GROUP BY event_type
            )
            SELECT event_type, avg_hourly_value, n_users, n_events,
                   p50_value, p90_value, n_outliers,
                   TRUE AS hll_merge_consistent,
                   TRUE AS hll_within_5pct
            FROM diurnal JOIN d USING (event_type)
                         JOIN pct USING (event_type)
                         JOIN outl USING (event_type)
        """,
        "q12_peak_load": f"""
            SELECT 'peak' AS tag, event_id, event_type,
                   strftime(ts, '{_DUCK_TS_US}') AS peak_ts, value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY event_type ORDER BY value DESC, event_id) = 1
            UNION ALL
            SELECT 'top3', event_id, event_type,
                   strftime(ts, '{_DUCK_TS_US}'), value
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY event_type ORDER BY value DESC, event_id) <= 3
        """,
        "q14_sort_limit": """
            SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
                   coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY total_price DESC, o_orderstatus, o_orderpriority
            LIMIT 10
        """,
        "q15_union": """
            WITH u AS (
              SELECT c_nationkey AS nation_key, 'customer' AS src,
                     c_acctbal AS value FROM customer
              UNION ALL
              SELECT s_nationkey, 'supplier', s_acctbal FROM supplier
            )
            SELECT 'union' AS op, nation_key, src,
                   round(sum(value), 2) AS sum_value
            FROM u GROUP BY nation_key, src
            UNION ALL
            SELECT 'intersect', nation_key, '-', 0.0 FROM (
              SELECT c_nationkey AS nation_key FROM customer
              INTERSECT
              SELECT s_nationkey FROM supplier
            )
            UNION ALL
            SELECT 'except', nation_key, '-', 0.0 FROM (
              SELECT c_nationkey AS nation_key FROM customer
              EXCEPT
              SELECT s_nationkey FROM supplier
            )
        """,
        "q18_arith_expression": """
            WITH a AS (
              SELECT o_orderpriority, sum(o_totalprice) AS value FROM orders
              WHERE extract(year FROM o_orderdate) <= 1996 GROUP BY o_orderpriority
            ), b AS (
              SELECT o_orderpriority, sum(o_totalprice) AS value FROM orders
              WHERE extract(year FROM o_orderdate) > 1996 GROUP BY o_orderpriority
            )
            SELECT a.o_orderpriority, round(a.value - b.value, 2) AS value
            FROM a JOIN b USING (o_orderpriority)
        """,
        "q19_pivot": """
            SELECT o_orderpriority,
                   round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
                   round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
                   round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
            FROM orders GROUP BY o_orderpriority
        """,
        "q20_unpivot": """
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                   l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        """,
        "q21_scalar_datetime": """
            SELECT 'month' AS op,
                   extract(year FROM l_shipdate) AS k1,
                   extract(month FROM l_shipdate) AS k2,
                   count(*) AS n,
                   CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
                     AS value
            FROM lineitem GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'session' AS op, user_id AS k1,
                   CAST(floor(epoch(min(ts))) AS BIGINT) AS k2,
                   count(*) AS n,
                   CAST(floor(sum(value) * 1e6 + 0.5) AS DOUBLE) AS value
            FROM (
              SELECT user_id, ts, value,
                     sum(newf) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
              FROM (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts) IS NULL
                              OR ts - lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts)
                                 >= INTERVAL '28800 seconds'
                            THEN 1 ELSE 0 END AS newf
                FROM events
              )
            )
            GROUP BY user_id, sid
        """,
        "q22_unit_conversion": """
            SELECT event_id, event_type,
                   CAST(floor(value * 0.001 * 1e9 + 0.5) AS BIGINT) AS value_mwh_nano
            FROM events
        """,
        "q23_time_downsample": f"""
            SELECT 'down' AS mode,
                   strftime(make_timestamp(CAST(floor(epoch(ts)/21600)*21600*1000000 AS BIGINT)),
                            '{_DUCK_TS}') AS ts,
                   event_type AS grp,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS value
            FROM events
            GROUP BY 2, 3
            UNION ALL
            SELECT 'up', ts_6h, l_returnflag, value FROM (
              WITH daily AS (
                SELECT l_shipdate AS ts, l_returnflag, sum(l_quantity) AS value
                FROM lineitem WHERE extract(year FROM l_shipdate) = 1995
                GROUP BY 1, 2
              )
              SELECT strftime(d.ts + to_hours(6 * g.i), '{_DUCK_TS}') AS ts_6h,
                     d.l_returnflag,
                     CAST(floor(d.value / 4 * 1e6 + 0.5) AS BIGINT) AS value
              FROM daily d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) g
            )
            UNION ALL
            SELECT 'cascade:hour' AS mode,
                   strftime(date_trunc('hour', ts), '{_DUCK_TS}') AS ts,
                   event_type AS grp,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS value
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'cascade:day' AS mode,
                   strftime(date_trunc('day', ts), '{_DUCK_TS}') AS ts,
                   event_type AS grp,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS value
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'cascade:month' AS mode,
                   strftime(date_trunc('month', ts), '{_DUCK_TS}') AS ts,
                   event_type AS grp,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS value
            FROM events GROUP BY 2, 3
        """,
        "q24_annual_to_hourly": f"""
            WITH annual AS (
              SELECT CAST(extract(year FROM o_orderdate) AS VARCHAR) AS model_year,
                     extract(year FROM o_orderdate) AS yr,
                     o_orderpriority, sum(o_totalprice) AS value
              FROM orders
              WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
                AND extract(year FROM o_orderdate) IN (1995, 1996)
              GROUP BY 1, 2, 3
            )
            SELECT a.model_year, a.o_orderpriority,
                   strftime(g.ts, '{_DUCK_TS}') AS hour_ts,
                   CAST(floor(a.value / (CASE WHEN a.yr = 1996
                        THEN 8784.0 ELSE 8760.0 END) * 1e6 + 0.5) AS BIGINT) AS value
            FROM annual a
            CROSS JOIN LATERAL (
              SELECT unnest(generate_series(
                make_timestamp(a.yr, 1, 1, 0, 0, 0.0),
                make_timestamp(a.yr, 12, 31, 23, 0, 0.0),
                INTERVAL 1 HOUR)) AS ts
            ) g
        """,
        "q25_tz_convert": f"""
            SELECT 'single' AS mode, event_id, '-' AS geography,
                   'Etc/GMT+7' AS time_zone,
                   strftime(ts - INTERVAL 7 HOURS, '{_DUCK_TS_US}') AS local_ts
            FROM events
            UNION ALL
            SELECT 'by_geo', event_id, CAST(user_id % 4 AS VARCHAR),
                   'Etc/GMT+' || CAST(5 + user_id % 4 AS VARCHAR),
                   strftime(ts - to_hours(CAST(5 + user_id % 4 AS BIGINT)),
                            '{_DUCK_TS_US}')
            FROM events
        """,
        "q27_growth_exponential": """
            WITH initial AS (
              SELECT o_orderpriority, sum(o_totalprice) AS value
              FROM orders WHERE extract(year FROM o_orderdate) = 1995
              GROUP BY o_orderpriority
            ), years AS (
              SELECT unnest(['1996', '1997', '1998']) AS model_year
            )
            SELECT 'exp' AS mode, i.o_orderpriority, y.model_year,
                   round(i.value * power(1.05,
                        CAST(y.model_year AS INT) - 1995), 2) AS value
            FROM initial i CROSS JOIN years y
            UNION ALL
            SELECT 'mult', o_orderpriority, '-', value FROM (
              WITH all_initial AS (
                SELECT o_orderpriority, sum(o_totalprice) AS value
                FROM orders GROUP BY 1
              ), r AS (
                SELECT o_orderpriority,
                       row_number() OVER (ORDER BY o_orderpriority) / 10.0 AS rate
                FROM (SELECT DISTINCT o_orderpriority FROM orders)
              )
              SELECT i.o_orderpriority, round(i.value * r.rate, 2) AS value
              FROM all_initial i JOIN r USING (o_orderpriority)
            )
        """,
        # 'stream' expected = the originals: the corpus has no
        # identical-text groups (q30 oracle relies on the same fact), so
        # micro-batch 1 keeps everything and the injected copies in
        # micro-batch 2 all hit existing state and drop
        "q28_dedup_exact": f"""
            SELECT 'batch' AS op, doc_id, lang, source FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY {_NORM_TEXT} ORDER BY doc_id) = 1
            UNION ALL
            SELECT 'stream', doc_id, lang, source FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY {_NORM_TEXT} ORDER BY doc_id) = 1
            UNION ALL
            SELECT 'compact', doc_id, lang, source FROM documents
            UNION ALL
            SELECT 'bloom', doc_id, lang, source FROM documents d
            WHERE doc_id >= 250 AND NOT EXISTS (
              SELECT 1 FROM documents c WHERE c.doc_id < 250
                AND trim(regexp_replace(regexp_replace(lower(c.text),
                      '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g'))
                  = trim(regexp_replace(regexp_replace(lower(d.text),
                      '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')))
        """,
        "q29_text_stats": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\\s+') AS w
              FROM documents
            ), bigr AS (
              SELECT doc_id, w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS bigram
              FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
            ), model AS (
              SELECT bigram, count(*) AS c FROM bigr GROUP BY bigram
            ), fam AS (
              SELECT b.doc_id,
                     CAST(floor(sum(m.c) * 1000000.0 / count(*)) AS BIGINT) AS lm
              FROM bigr b JOIN model m USING (bigram)
              GROUP BY b.doc_id
            ), bmbase AS (
              SELECT doc_id,
                     CAST(len(list_filter(w, x -> x != '')) AS BIGINT) AS dl,
                     w
              FROM toks
            ), bmstats AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t
              FROM bmbase
            ), bmhits AS (
              SELECT doc_id, dl, term,
                     CAST(len(list_filter(w, x -> x = term)) AS BIGINT) AS tf
              FROM (SELECT doc_id, dl, w,
                           unnest(list_intersect(
                             w, ['window', 'stream', 'vector'])) AS term
                    FROM bmbase)
            ), bmdf AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM bmhits GROUP BY term
            ), bm25 AS (
              -- rational-idf BM25 micro-score, literal-for-literal the
              -- fixed IEEE sequence the Spark operator runs (micro=True)
              SELECT doc_id,
                     CAST(sum(CAST(floor(1000000.0 *
                       ((2.0 * n - 2.0 * df + 1.0)
                          * CAST(tf AS DOUBLE) * 2.2) /
                       ((2.0 * df + 1.0) * ((CAST(tf AS DOUBLE) + 0.3)
                          + (0.9 * n / CAST(t AS DOUBLE))
                            * CAST(dl AS DOUBLE)))
                     ) AS BIGINT)) AS BIGINT) AS bm
              FROM bmhits JOIN bmdf USING (term) CROSS JOIN bmstats
              GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                   CAST(CASE WHEN trim(text) = '' THEN 0 ELSE (
                     SELECT sum(CAST(ceil(len(w) / 4.0) AS INT))
                     FROM unnest(string_split_regex(trim(text), '\\s+')) AS t(w)
                   ) END AS BIGINT) AS n_tokens_bpe,
                   CAST(floor(CASE WHEN len(text) > 0 THEN
                     len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000.0 / len(text)
                     ELSE 0.0 END) AS BIGINT) AS alpha_ratio_ppm,
                   coalesce(fam.lm, 0) AS lm_familiarity_micro,
                   CAST(coalesce(bm25.bm, 0) AS BIGINT) AS bm25_micro
            FROM documents d LEFT JOIN fam ON d.doc_id = fam.doc_id
                             LEFT JOIN bm25 ON d.doc_id = bm25.doc_id
        """,
        "q36_index_time": f"""
            SELECT 'index' AS mode, event_id,
                   CAST(user_id % 2 AS VARCHAR) AS geography,
                   strftime(TIMESTAMP '2024-06-01 00:00:00'
                     + to_hours(CASE WHEN user_id % 2 = 0 THEN 5 ELSE 8 END)
                     + to_hours(event_id % 24), '{_DUCK_TS}') AS ts,
                   value
            FROM events
            UNION ALL
            SELECT 'wrap', event_id, '-',
                   strftime(TIMESTAMP '2024-01-01 00:00:00' + to_microseconds(
                     ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                       % 604800000000 + 604800000000) % 604800000000),
                     '{_DUCK_TS_US}'),
                   0.0
            FROM events
        """,
        "q37_leap_day": """
            SELECT 'leap' AS mode, CAST(extract(month FROM ts) AS VARCHAR) AS key,
                   count(*) AS n, round(sum(value), 2) AS value
            FROM events
            WHERE NOT (extract(month FROM ts) = 2 AND extract(day FROM ts) = 29)
              AND NOT (extract(month FROM ts) = 1 AND extract(day FROM ts) = 1)
            GROUP BY 2
            UNION ALL
            SELECT 'gaps', event_type, n_missing_hours, 0.0 FROM (
              WITH cal AS (
                SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                  TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS hour
              ), actual AS (
                SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour
                FROM events
              ), combos AS (
                SELECT t.event_type, c.hour
                FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN cal c
              )
              SELECT event_type, count(*) AS n_missing_hours
              FROM combos x
              WHERE NOT EXISTS (SELECT 1 FROM actual a
                                WHERE a.event_type = x.event_type
                                  AND a.hour = x.hour)
              GROUP BY event_type
            )
        """,
        "q40_pivoted_load": """
            SELECT o_orderpriority, o_orderstatus, 'base' AS scenario,
                   round(sum(o_totalprice), 2) AS value
            FROM orders GROUP BY 1, 2
        """,
        "q41_representative_time": f"""
            WITH template AS (
              SELECT extract(month FROM ts) AS month,
                     (dayofweek(ts) + 6) % 7 AS day_of_week,
                     extract(hour FROM ts) AS hour,
                     CAST(user_id % 2 AS VARCHAR) AS geography,
                     round(sum(value), 2) AS value
              FROM events GROUP BY 1, 2, 3, 4
              HAVING extract(month FROM ts) = 1
            ), zones AS (
              SELECT * FROM (VALUES ('0', 6), ('1', 7)) AS z(geography, off)
            ), cal AS (
              SELECT z.geography, g.ts,
                     extract(month FROM g.ts - to_hours(z.off)) AS month,
                     (dayofweek(g.ts - to_hours(z.off)) + 6) % 7 AS day_of_week,
                     extract(hour FROM g.ts - to_hours(z.off)) AS hour
              FROM zones z CROSS JOIN (
                SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                  TIMESTAMP '2024-12-31 23:00:00', INTERVAL 1 HOUR)) AS ts) g
            )
            SELECT 'dow' AS fmt, t.geography,
                   strftime(c.ts, '{_DUCK_TS}') AS utc_hour, t.value
            FROM template t
            JOIN cal c USING (geography, month, day_of_week, hour)
            UNION ALL
            SELECT 'weekday', geography, utc_hour, value FROM (
              WITH template AS (
                SELECT extract(month FROM ts) AS month,
                       (dayofweek(ts) + 6) % 7 < 5 AS is_weekday,
                       extract(hour FROM ts) AS hour,
                       CAST(user_id % 2 AS VARCHAR) AS geography,
                       round(sum(value), 2) AS value
                FROM events GROUP BY 1, 2, 3, 4
                HAVING extract(month FROM ts) = 1
              ), zones AS (
                SELECT * FROM (VALUES ('0', 6), ('1', 7)) AS z(geography, off)
              ), cal AS (
                SELECT z.geography, g.ts,
                       extract(month FROM g.ts - to_hours(z.off)) AS month,
                       (dayofweek(g.ts - to_hours(z.off)) + 6) % 7 < 5 AS is_weekday,
                       extract(hour FROM g.ts - to_hours(z.off)) AS hour
                FROM zones z CROSS JOIN (
                  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                    TIMESTAMP '2024-12-31 23:00:00', INTERVAL 1 HOUR)) AS ts) g
              )
              SELECT t.geography, strftime(c.ts, '{_DUCK_TS}') AS utc_hour, t.value
              FROM template t
              JOIN cal c USING (geography, month, is_weekday, hour)
            )
        """,
        "q42_language_id": _LANG_ID_SQL,
        "q32_similarity_bruteforce": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\\s+') AS w
              FROM documents
            ), bmbase AS (
              SELECT doc_id,
                     CAST(len(list_filter(w, x -> x != '')) AS BIGINT) AS dl,
                     w
              FROM toks
            ), bmstats AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(dl) AS BIGINT) AS t
              FROM bmbase
            ), bmhits AS (
              SELECT doc_id, dl, term,
                     CAST(len(list_filter(w, x -> x = term)) AS BIGINT) AS tf
              FROM (SELECT doc_id, dl, w,
                           unnest(list_intersect(
                             w, ['window', 'stream', 'vector'])) AS term
                    FROM bmbase)
            ), bmdf AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM bmhits GROUP BY term
            ), bm AS (
              -- rational-idf BM25 micro-score, literal-for-literal the
              -- fixed IEEE sequence the Spark operator runs (micro=True)
              SELECT doc_id,
                     CAST(sum(CAST(floor(1000000.0 *
                       ((2.0 * n - 2.0 * df + 1.0)
                          * CAST(tf AS DOUBLE) * 2.2) /
                       ((2.0 * df + 1.0) * ((CAST(tf AS DOUBLE) + 0.3)
                          + (0.9 * n / CAST(t AS DOUBLE))
                            * CAST(dl AS DOUBLE)))
                     ) AS BIGINT)) AS BIGINT) AS bm
              FROM bmhits JOIN bmdf USING (term) CROSS JOIN bmstats
              GROUP BY doc_id
            ), lex0 AS (
              SELECT doc_id AS vec_id,
                     row_number() OVER (ORDER BY bm DESC, doc_id) AS r
              FROM bm
              QUALIFY row_number() OVER (ORDER BY bm DESC, doc_id) <= 5
            ), qids AS (
              SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 3
            ), lex AS (
              SELECT q.query_id, l.vec_id, l.r
              FROM lex0 l CROSS JOIN qids q
            ), sem AS (
              SELECT q.vec_id AS query_id, c.vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                                  CAST(c.embedding AS DOUBLE[]),
                                  CAST(q.embedding AS DOUBLE[])) DESC,
                                c.vec_id) AS r
              FROM embeddings c
              CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
              QUALIFY row_number() OVER (
                  PARTITION BY q.vec_id
                  ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                  CAST(q.embedding AS DOUBLE[])) DESC,
                           c.vec_id) <= 5
            ), fused AS (
              -- semantic term first, lexical second: the ADDITION ORDER
              -- matches the Spark expression, so the double is bit-equal
              SELECT coalesce(s.query_id, l.query_id) AS query_id,
                     coalesce(s.vec_id, l.vec_id) AS vec_id,
                     coalesce(1.0 / (60 + s.r), 0.0)
                       + coalesce(1.0 / (60 + l.r), 0.0) AS rrf
              FROM sem s FULL OUTER JOIN lex l
                ON s.query_id = l.query_id AND s.vec_id = l.vec_id
            )
            SELECT 'brute' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(floor(list_cosine_similarity(
                       CAST(c.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])) * 1e6 + 0.5) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])) DESC,
                         c.vec_id) <= 5
            UNION ALL
            SELECT 'rrf' AS op, query_id, vec_id,
                   CAST(floor(rrf * 1e9 + 0.5) AS BIGINT) AS score
            FROM fused
            UNION ALL
            -- 'bdf': per-query top-5 by the SAME rational-idf micro
            -- score the persisted bm25_search emits (micro=True); the
            -- per-term scores reuse bmhits/bmdf/bmstats above, summed
            -- per (query, doc) over each query's term set
            SELECT 'bdf' AS op, CAST(bq_qid AS BIGINT) AS query_id,
                   doc_id AS vec_id, score
            FROM (
              SELECT bq.bq_qid, h.doc_id,
                     CAST(sum(CAST(floor(1000000.0 *
                       ((2.0 * n - 2.0 * df + 1.0)
                          * CAST(tf AS DOUBLE) * 2.2) /
                       ((2.0 * df + 1.0) * ((CAST(tf AS DOUBLE) + 0.3)
                          + (0.9 * n / CAST(t AS DOUBLE))
                            * CAST(dl AS DOUBLE)))
                     ) AS BIGINT)) AS BIGINT) AS score
              FROM bmhits h
              JOIN bmdf USING (term)
              JOIN (SELECT * FROM (VALUES (0, 'window'), (0, 'stream'),
                                          (1, 'vector'), (1, 'stream'),
                                          (2, 'window'), (2, 'vector'))
                    v(bq_qid, term)) bq ON bq.term = h.term
              CROSS JOIN bmstats
              GROUP BY bq.bq_qid, h.doc_id
            )
            QUALIFY row_number() OVER (
                PARTITION BY bq_qid ORDER BY score DESC, doc_id) <= 5
        """,
        "q33_similarity_lsh": """
            WITH corpus AS (
              SELECT vec_id,
                     [CASE WHEN vec_id % 3 = 0 THEN (vec_id + 1) * 3.0 ELSE 0.0 END,
                      CASE WHEN vec_id % 3 = 0 THEN (vec_id + 1) * 4.0 ELSE 0.0 END,
                      CASE WHEN vec_id % 3 = 1 THEN (vec_id + 1) * 3.0 ELSE 0.0 END,
                      CASE WHEN vec_id % 3 = 1 THEN (vec_id + 1) * 4.0 ELSE 0.0 END,
                      CASE WHEN vec_id % 3 = 2 THEN (vec_id + 1) * 3.0 ELSE 0.0 END,
                      CASE WHEN vec_id % 3 = 2 THEN (vec_id + 1) * 4.0 ELSE 0.0 END
                     ] AS embedding
              FROM embeddings WHERE vec_id < 15
            )
            SELECT op, query_id, vec_id, score FROM (
              SELECT 'single' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(floor(list_cosine_similarity(c.embedding, q.embedding)
                              * 1e6 + 0.5) AS BIGINT) AS score
            FROM corpus c CROSS JOIN (SELECT * FROM corpus WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
                         c.vec_id) <= 5
            )
            UNION ALL
            SELECT op, query_id, vec_id, score FROM (
              SELECT 'probe' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(floor(list_cosine_similarity(c.embedding, q.embedding)
                              * 1e6 + 0.5) AS BIGINT) AS score
            FROM corpus c CROSS JOIN (SELECT * FROM corpus WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
                         c.vec_id) <= 5
            )
            UNION ALL
            SELECT op, query_id, vec_id, score FROM (
              SELECT 'ham' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) ASC,
                         c.vec_id) <= 5
            )
            UNION ALL
            -- 'hdisk': the persisted binary index under a FULL probe is
            -- exhaustive, so the expected rows are the same
            -- sign-disagreement top-5 as 'ham' (integer-exact)
            SELECT op, query_id, vec_id, score FROM (
              SELECT 'hdisk' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) ASC,
                         c.vec_id) <= 5
            )
            UNION ALL
            -- 'hdf': the DataFrame-query search of the same index is
            -- bit-identical to the list form under a full probe
            SELECT op, query_id, vec_id, score FROM (
              SELECT 'hdf' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) ASC,
                         c.vec_id) <= 5
            )
            UNION ALL
            -- 'rebal': after retrain + reassign the bits are unchanged
            -- and a full probe of the new generation is exhaustive, so
            -- the expected rows are the same sign-disagreement top-5
            SELECT op, query_id, vec_id, score FROM (
              SELECT 'rebal' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(range(64), i ->
                     CASE WHEN (CAST(c.embedding[i + 1] AS DOUBLE) > 0)
                            <> (CAST(q.embedding[i + 1] AS DOUBLE) > 0)
                          THEN 1 ELSE 0 END)) ASC,
                         c.vec_id) <= 5
            )
        """,
        "q43_ngram_jaccard": f"""
            WITH sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) >= 5 THEN
                       list_distinct([array_to_string(w[(i+1):(i+5)], ' ')
                                      for i in range(0, len(w) - 4)])
                     ELSE [array_to_string(w, ' ')] END AS s
              FROM (SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS w
                    FROM documents WHERE doc_id < 250)
            )
            SELECT 'jaccard' AS op, id_a, id_b,
                   CAST(floor(jac * 1e6 + 0.5) AS BIGINT) AS score FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
                       THEN len(list_intersect(a.s, b.s)) * 1.0
                            / len(list_distinct(list_concat(a.s, b.s)))
                       ELSE 0.0 END AS jac
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            ) WHERE jac >= 0.8
            UNION ALL
            SELECT 'contam', doc_id, n, CAST(0 AS BIGINT) FROM (
              WITH aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 50 = 0 THEN concat(text,
                         ' alpha beta gamma delta epsilon zeta eta theta')
                       ELSE text END AS text
                FROM documents WHERE doc_id < 250
              ), csh AS (
                SELECT doc_id,
                       CASE WHEN len(w) >= 5 THEN
                         list_distinct([array_to_string(w[(i+1):(i+5)], ' ')
                                        for i in range(0, len(w) - 4)])
                       ELSE [array_to_string(w, ' ')] END AS s
                FROM (SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS w
                      FROM aug)
              )
              SELECT doc_id,
                     len(list_intersect(s,
                       ['alpha beta gamma delta epsilon',
                        'beta gamma delta epsilon zeta',
                        'gamma delta epsilon zeta eta',
                        'delta epsilon zeta eta theta'])) AS n
              FROM csh
            ) WHERE n >= 1
            UNION ALL
            SELECT 'split', doc_id,
                   CASE WHEN hb < 300000 THEN 1 ELSE 0 END,
                   CAST(0 AS BIGINT)
            FROM (
              WITH RECURSIVE dsh AS (
                SELECT doc_id,
                       CASE WHEN len(w) >= 5 THEN
                         list_distinct([array_to_string(w[(i+1):(i+5)], ' ')
                                        for i in range(0, len(w) - 4)])
                       ELSE [array_to_string(w, ' ')] END AS s
                FROM (SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS w
                      FROM documents WHERE doc_id < 250)
              ), dpairs AS (
                SELECT a.doc_id AS ia, b.doc_id AS ib
                FROM dsh a JOIN dsh b ON a.doc_id < b.doc_id
                WHERE len(list_distinct(list_concat(a.s, b.s))) > 0
                  AND len(list_intersect(a.s, b.s)) * 1.0
                      / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
              ), edges AS (
                SELECT ia AS a, ib AS b FROM dpairs
                UNION SELECT ib, ia FROM dpairs
              ), reach(id, r) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
              ), comp AS (
                SELECT id, min(r) AS component FROM reach GROUP BY id
              )
              SELECT d.doc_id,
                     CAST(concat('0x', substr(md5(concat(
                       CAST(coalesce(c.component, d.doc_id) AS VARCHAR),
                       'sp')), 1, 8)) AS BIGINT) % 1000000 AS hb
              FROM (SELECT doc_id FROM documents WHERE doc_id < 250) d
              LEFT JOIN comp c ON d.doc_id = c.id
            )
        """,
        "q44_embedding_neardup": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id < 100
            ), corpus AS (
              SELECT vec_id, v FROM base
              UNION ALL
              SELECT vec_id + 100000, list_transform(v, x -> x * 1.01) FROM base
            )
            SELECT 'pair' AS op, id_a, id_b, round(score, 6) AS score FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_cosine_similarity(a.v, b.v) AS score
              FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            ) WHERE score >= 0.999
            UNION ALL
            -- 'sem': duplicate components are exactly the vec_id % 32
            -- residue classes (see the Spark-side construction); the
            -- surviving min id IS the residue, and the survivor's
            -- cosine to its cluster axis is cos(50° * class), class =
            -- residue // 16 (survivor jitter j = 0 by construction)
            SELECT 'sem' AS op,
                   CAST(r AS BIGINT) AS id_a,
                   CAST(n AS BIGINT) AS id_b,
                   round(cos(radians(50.0 * (r // 16))), 6) AS score
            FROM (SELECT vec_id % 32 AS r, count(*) AS n
                  FROM embeddings WHERE vec_id < 512
                  GROUP BY vec_id % 32)
        """,
        "q45_similarity_ivf": """
            SELECT 'ivf' AS op, q.vec_id AS query_id, c.vec_id,
                   CAST(floor(list_cosine_similarity(
                       CAST(c.embedding AS DOUBLE[]),
                       CAST(q.embedding AS DOUBLE[])) * 1e6 + 0.5) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                                CAST(q.embedding AS DOUBLE[])) DESC,
                         c.vec_id) <= 5
            UNION ALL
            SELECT 'proj', vec_id, CAST(j AS INT),
                   CAST(list_sum(list_transform(range(64), i ->
                     floor(CAST(embedding[i + 1] AS DOUBLE) * 1000 + 0.5)
                     * CASE WHEN CAST(concat('0x', substr(md5(concat(
                         'rp:', CAST(i AS VARCHAR), ',', CAST(j AS VARCHAR)
                       )), 1, 2)) AS INT) % 2 = 0 THEN 1 ELSE -1 END))
                   AS BIGINT) AS score
            FROM embeddings, (SELECT unnest(range(8)) AS j) js
            WHERE vec_id < 20
            UNION ALL
            SELECT 'pq', q.vec_id AS query_id, c.vec_id,
                   CAST(floor(list_sum(list_transform(range(64), i ->
                     floor(CAST(c.embedding[i + 1] AS DOUBLE) * 2)
                     * floor(CAST(q.embedding[i + 1] AS DOUBLE) * 2)))
                     + 0.5) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(range(64), i ->
                     floor(CAST(c.embedding[i + 1] AS DOUBLE) * 2)
                     * floor(CAST(q.embedding[i + 1] AS DOUBLE) * 2))) DESC,
                         c.vec_id) <= 5
            UNION ALL
            SELECT 'disk', q.vec_id AS query_id, c.vec_id,
                   CAST(floor(list_sum(list_transform(range(64), i ->
                     floor(CAST(c.embedding[i + 1] AS DOUBLE) * 2)
                     * floor(CAST(q.embedding[i + 1] AS DOUBLE) * 2)))
                     + 0.5) AS BIGINT) AS score
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 3) q
            QUALIFY row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_sum(list_transform(range(64), i ->
                     floor(CAST(c.embedding[i + 1] AS DOUBLE) * 2)
                     * floor(CAST(q.embedding[i + 1] AS DOUBLE) * 2))) DESC,
                         c.vec_id) <= 5
        """,
        "q46_sample_and_cap": """
            WITH sampled AS (
              SELECT doc_id, lang, source, n_chars,
                     CAST(concat('0x',
                       substr(md5(concat(CAST(doc_id AS VARCHAR), '')), 1, 8))
                     AS BIGINT) % 1000000 AS hb
              FROM documents
              WHERE CAST(concat('0x',
                      substr(md5(concat(CAST(doc_id AS VARCHAR), 'r2')), 1, 8))
                    AS BIGINT) % 1000000 < 300000
            ), capped AS (
              SELECT doc_id, lang, source, n_chars, hb FROM sampled
              QUALIFY row_number() OVER (
                PARTITION BY lang ORDER BY hb, doc_id) <= 50
            )
            SELECT 'pack' AS op, doc_id, lang, source,
                   dense_rank() OVER (PARTITION BY lang ORDER BY raw_batch)
                     - 1 AS batch_index
            FROM (
              SELECT doc_id, lang, source,
                     CAST(floor((sum(n_chars) OVER (
                            PARTITION BY lang ORDER BY hb, doc_id
                            ROWS UNBOUNDED PRECEDING) - n_chars)
                          / 5000.0) AS BIGINT) AS raw_batch
              FROM capped
            )
            UNION ALL
            SELECT 'mix', d.doc_id, d.lang, d.source, CAST(-1 AS BIGINT)
            FROM documents d JOIN (
              SELECT t.lang,
                     CAST(floor(1000000.0 * w.wt * b.budget / t.t)
                          AS BIGINT) AS threshold
              FROM (SELECT lang, sum(n_chars) AS t
                    FROM documents GROUP BY lang) t
              JOIN (VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2),
                           ('fr', 0.2)) w(lang, wt) ON t.lang = w.lang
              CROSS JOIN (
                SELECT min(t.t / w.wt) AS budget
                FROM (SELECT lang, sum(n_chars) AS t
                      FROM documents GROUP BY lang) t
                JOIN (VALUES ('en', 0.4), ('de', 0.2), ('es', 0.2),
                             ('fr', 0.2)) w(lang, wt) ON t.lang = w.lang
              ) b
            ) thr ON d.lang = thr.lang
            WHERE CAST(concat('0x', substr(md5(concat(
                    CAST(d.doc_id AS VARCHAR), 'mix')), 1, 8))
                  AS BIGINT) % 1000000 < thr.threshold
            UNION ALL
            SELECT 'strat', doc_id, lang, source, CAST(-1 AS BIGINT)
            FROM documents
            WHERE CAST(concat('0x', substr(md5(concat(
                    CAST(doc_id AS VARCHAR), 'st')), 1, 8))
                  AS BIGINT) % 1000000
                  < CASE lang WHEN 'en' THEN 500000
                              WHEN 'de' THEN 250000
                              ELSE 100000 END
            UNION ALL
            SELECT 'shuffle', doc_id, lang, source,
                   CAST(shard * 1000000
                        + row_number() OVER (PARTITION BY shard
                                             ORDER BY ord, doc_id)
                        - 1 AS BIGINT)
            FROM (
              SELECT doc_id, lang, source,
                     CAST(concat('0x', substr(md5(concat(
                         CAST(doc_id AS VARCHAR), 'ep0#shard')), 1, 8))
                       AS BIGINT) % 1000000 % 7 AS shard,
                     CAST(concat('0x', substr(md5(concat(
                         CAST(doc_id AS VARCHAR), 'ep0')), 1, 8))
                       AS BIGINT) % 1000000 AS ord
              FROM documents
            )
            UNION ALL
            SELECT 'chunks', doc_id, lang, source,
                   CAST(c * 100000000
                        + (greatest(s, c * 5000) - c * 5000) * 10000
                        + (least(e, (c + 1) * 5000) - c * 5000) AS BIGINT)
            FROM (
              SELECT doc_id, lang, source, s, e,
                     unnest(generate_series(
                       CAST(floor(s / 5000.0) AS BIGINT),
                       CAST(floor((e - 1) / 5000.0) AS BIGINT))) AS c
              FROM (
                SELECT doc_id, lang, source,
                       sum(n_chars) OVER (PARTITION BY lang
                         ORDER BY hb, doc_id
                         ROWS UNBOUNDED PRECEDING) - n_chars AS s,
                       sum(n_chars) OVER (PARTITION BY lang
                         ORDER BY hb, doc_id
                         ROWS UNBOUNDED PRECEDING) AS e
                FROM (
                  SELECT doc_id, lang, source, n_chars,
                         CAST(concat('0x', substr(md5(concat(
                             CAST(doc_id AS VARCHAR), 'ck')), 1, 8))
                           AS BIGINT) % 1000000 AS hb
                  FROM documents WHERE n_chars > 0
                )
              )
            )
            UNION ALL
            SELECT 'budget', doc_id, lang, source, CAST(rt AS BIGINT)
            FROM (
              SELECT doc_id, lang, source, n_chars,
                     sum(n_chars) OVER (ORDER BY hb, doc_id
                       ROWS UNBOUNDED PRECEDING) AS rt
              FROM (
                SELECT doc_id, lang, source, n_chars,
                       CAST(concat('0x', substr(md5(concat(
                           CAST(doc_id AS VARCHAR), 'tb')), 1, 8))
                         AS BIGINT) % 1000000 AS hb
                FROM documents
              )
            )
            WHERE rt - n_chars < 20000
            UNION ALL
            -- 'dsir': hashed n-gram importance resampling toward the
            -- 'de' slice. Bucket log-ratios are discretized at the 10k
            -- bucket table (ln calls bounded by buckets, not corpus);
            -- per-doc scores are exact integer sums; Gumbel noise is an
            -- md5-uniform pure function of doc_id.
            SELECT 'dsir', k.doc_id, d.lang, d.source,
                   k.key AS batch_index
            FROM (
              WITH words AS (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(lower(text)),
                                                      '\\s+'),
                                   x -> x != '') AS w
                FROM documents
              ), grams AS (
                SELECT doc_id, unnest(w) AS g FROM words
                UNION ALL
                SELECT doc_id,
                       w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
                      FROM words WHERE len(w) >= 2)
              ), bucketed AS (
                SELECT doc_id,
                       CAST(concat('0x', substr(md5(g || 'dsir'), 1, 8))
                         AS BIGINT) % 10000 AS b
                FROM grams
              ), rc AS (
                SELECT b, count(*) AS rn FROM bucketed GROUP BY b
              ), tc AS (
                SELECT bk.b AS b, count(*) AS tn
                FROM bucketed bk JOIN documents dd USING (doc_id)
                WHERE dd.lang = 'de' GROUP BY bk.b
              ), tot AS (
                SELECT (SELECT coalesce(sum(tn), 0) FROM tc) AS t,
                       (SELECT coalesce(sum(rn), 0) FROM rc) AS r
              ), lr AS (
                SELECT rg.range AS b,
                       CAST(floor((ln((coalesce(tc.tn, 0) + 1) * 1.0
                                      / (tot.t + 10000))
                                   - ln((coalesce(rc.rn, 0) + 1) * 1.0
                                        / (tot.r + 10000)))
                                  * 1000000 + 0.5) AS BIGINT) AS lr_micro
                FROM range(10000) rg
                LEFT JOIN tc ON tc.b = rg.range
                LEFT JOIN rc ON rc.b = rg.range
                CROSS JOIN tot
              ), per_doc AS (
                -- CAST: DuckDB sum(BIGINT) is HUGEINT, which would
                -- poison the whole union's batch_index to decimal128
                SELECT bk.doc_id, CAST(sum(lr.lr_micro) AS BIGINT) AS s
                FROM bucketed bk JOIN lr ON lr.b = bk.b
                GROUP BY bk.doc_id
              )
              SELECT d2.doc_id,
                     coalesce(pd.s, 0)
                     + CAST(floor(-ln(-ln((CAST(concat('0x', substr(
                           md5(concat(CAST(d2.doc_id AS VARCHAR),
                                      'dsir-g')), 1, 8)) AS BIGINT)
                           % 1000000 + 0.5) / 1000000.0))
                           * 1000000 + 0.5) AS BIGINT) AS key
              FROM documents d2 LEFT JOIN per_doc pd USING (doc_id)
              ORDER BY key DESC, d2.doc_id
              LIMIT 100
            ) k JOIN documents d USING (doc_id)
        """,
        "q47_fingerprint": f"""
            SELECT 'fp' AS op, doc_id, '' AS term,
                   count(*) OVER (PARTITION BY {_NORM_TEXT}) AS a,
                   CAST(0 AS BIGINT) AS b
            FROM documents
            UNION ALL
            SELECT 'term', doc_id, term, a, b FROM (
              WITH tf AS (
                SELECT doc_id, term, count(*) AS a
                FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(lower(text)),
                                                       '\\s+')) AS term
                      FROM documents)
                WHERE term <> ''
                GROUP BY doc_id, term
              ), dfq AS (
                SELECT term, count(*) AS b FROM tf GROUP BY term
              )
              SELECT doc_id, term, a, b
              FROM tf JOIN dfq USING (term)
              QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY a DESC, b ASC, term) <= 3
            )
            UNION ALL
            SELECT 'para', doc_id, md5(para) AS term, pos AS a,
                   CAST(2 AS BIGINT) AS b
            FROM (
              SELECT doc_id, pos, para,
                     trim(regexp_replace(regexp_replace(lower(para),
                          '[^\\w\\s]', '', 'g'), '\\s+', ' ', 'g')) AS fp
              FROM (
                SELECT doc_id, 0 AS pos, text AS para FROM documents
                UNION ALL
                SELECT doc_id, 1, 'boilerplate for ' || source
                FROM documents
              )
            )
            QUALIFY row_number() OVER (
              PARTITION BY fp ORDER BY doc_id, pos) = 1
            UNION ALL
            SELECT 'fuzzpara', doc_id, md5(para) AS term, pos AS a,
                   CAST(2 AS BIGINT) AS b
            FROM (
              -- every body survives (pairwise Jaccard 0 by construction)
              SELECT doc_id, CAST(0 AS INT) AS pos,
                     'b' || doc_id || 'a b' || doc_id || 'b b' || doc_id ||
                     'c b' || doc_id || 'd b' || doc_id || 'e b' || doc_id ||
                     'f b' || doc_id || 'g b' || doc_id || 'h b' || doc_id ||
                     'i b' || doc_id || 'j' AS para
              FROM documents
              UNION ALL
              -- footers are pairwise J=0.8 >= 0.7: only the global
              -- min-doc_id footer survives the fuzzy pass
              SELECT doc_id, 1,
                     'copyright example corp all rights reserved contact '
                     || 'the main office g' || (doc_id % 4)
              FROM documents
              WHERE doc_id = (SELECT min(doc_id) FROM documents)
            )
            UNION ALL
            -- 'span': exact duplicate-substring removal over a corpus of
            -- 120 doc-unique tokens + the SAME 60-token run; the global
            -- min-id doc keeps everything, all others lose exactly the
            -- shared suffix (windows fully inside the run cover tokens
            -- 120-179; boundary windows differ per doc)
            SELECT 'span', doc_id,
                   md5(CASE WHEN doc_id = (SELECT min(doc_id)
                                           FROM documents)
                       THEN uniq || ' ' || shared ELSE uniq END) AS term,
                   CASE WHEN doc_id = (SELECT min(doc_id) FROM documents)
                        THEN CAST(180 AS BIGINT)
                        ELSE CAST(120 AS BIGINT) END AS a,
                   CASE WHEN doc_id = (SELECT min(doc_id) FROM documents)
                        THEN CAST(0 AS BIGINT)
                        ELSE CAST(60 AS BIGINT) END AS b
            FROM (
              SELECT doc_id,
                     array_to_string([
                       'u' || CAST(doc_id AS VARCHAR) || 't'
                           || CAST(j AS VARCHAR) for j in range(0, 120)
                     ], ' ') AS uniq,
                     array_to_string([
                       's' || CAST(j AS VARCHAR) for j in range(0, 60)
                     ], ' ') AS shared
              FROM documents
            )
            UNION ALL
            -- 'hh': corpus-wide top-20 trigrams; rank rides doc_id,
            -- total order (count desc, trigram asc) is deterministic
            SELECT 'hh',
                   CAST(row_number() OVER (ORDER BY cnt DESC, g) AS BIGINT),
                   g AS term, cnt AS a, CAST(3 AS BIGINT) AS b
            FROM (
              SELECT g, CAST(count(*) AS BIGINT) AS cnt
              FROM (
                SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                       || ' ' || w[CAST(i AS INT) + 2] AS g
                FROM (
                  SELECT w, unnest(range(1, len(w) - 1)) AS i
                  FROM (
                    SELECT list_filter(
                             string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x != '') AS w
                    FROM documents
                  )
                  WHERE len(w) >= 3
                )
              )
              GROUP BY g
              ORDER BY cnt DESC, g
              LIMIT 20
            )
            UNION ALL
            -- 'ahh': bounded-state Misra-Gries + exact recount; at
            -- capacity 16384 the exactness bound (f20 > N/(cap+1))
            -- holds on this corpus, so the rows must equal 'hh'
            SELECT 'ahh',
                   CAST(row_number() OVER (ORDER BY cnt DESC, g) AS BIGINT),
                   g AS term, cnt AS a, CAST(3 AS BIGINT) AS b
            FROM (
              SELECT g, CAST(count(*) AS BIGINT) AS cnt
              FROM (
                SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]
                       || ' ' || w[CAST(i AS INT) + 2] AS g
                FROM (
                  SELECT w, unnest(range(1, len(w) - 1)) AS i
                  FROM (
                    SELECT list_filter(
                             string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x != '') AS w
                    FROM documents
                  )
                  WHERE len(w) >= 3
                )
              )
              GROUP BY g
              ORDER BY cnt DESC, g
              LIMIT 20
            )
        """,
        "q48_supplemental_filter": """
            SELECT c_mktsegment, count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS sum_acctbal
            FROM customer
            WHERE CAST(c_nationkey AS VARCHAR) IN (
              SELECT CAST(n_nationkey AS VARCHAR)
              FROM nation JOIN region ON n_regionkey = r_regionkey
              WHERE r_name IN ('ASIA', 'EUROPE'))
            GROUP BY c_mktsegment
        """,
        "q49_add_name_column": """
            SELECT CAST(user_id % 4 AS VARCHAR) AS geography,
                   CASE CAST(user_id % 4 AS VARCHAR)
                     WHEN '0' THEN 'north' WHEN '1' THEN 'south'
                     WHEN '2' THEN 'east' ELSE 'west' END AS geography_name,
                   count(*) AS n_events, round(sum(value), 2) AS value
            FROM events GROUP BY 1, 2
        """,
        "q50_dst_duplicate": f"""
            WITH hourly AS (
              SELECT date_trunc('hour', ts) AS h, sum(value) AS v
              FROM events GROUP BY 1
            ), shifted AS (
              SELECT 'spring' AS tag, h + INTERVAL 69 DAYS AS ts, v FROM hourly
              UNION ALL
              SELECT 'fall', h + INTERVAL 307 DAYS, v FROM hourly
            ), kept AS (
              SELECT * FROM shifted
              WHERE NOT (CAST(ts AS DATE) = DATE '2024-03-10'
                         AND extract(hour FROM ts) = 2)
            ), dups AS (
              SELECT tag, ts + INTERVAL 1 HOUR AS ts, v FROM shifted
              WHERE CAST(ts AS DATE) = DATE '2024-11-03'
                AND extract(hour FROM ts) = 1
            )
            SELECT tag, strftime(ts, '{_DUCK_TS}') AS local_ts,
                   CAST(floor(v * 1e6 + 0.5) AS BIGINT) AS value
            FROM (SELECT * FROM kept UNION ALL SELECT * FROM dups)
            UNION ALL
            SELECT 'interp', local_ts, value FROM (
              WITH ifall AS (
                SELECT date_trunc('hour', ts) + INTERVAL 307 DAYS AS ts,
                       sum(value) AS v
                FROM events GROUP BY 1
              ), ikept AS (
                SELECT ts, v FROM ifall
                WHERE NOT (CAST(ts AS DATE) = DATE '2024-03-10'
                           AND extract(hour FROM ts) = 2)
              ), idups AS (
                SELECT a.ts + INTERVAL 1 HOUR AS ts,
                       (a.v + coalesce(b.v, a.v)) / 2.0 AS v
                FROM ifall a LEFT JOIN ifall b ON b.ts = a.ts + INTERVAL 1 HOUR
                WHERE CAST(a.ts AS DATE) = DATE '2024-11-03'
                  AND extract(hour FROM a.ts) = 1
              )
              SELECT strftime(ts, '{_DUCK_TS}') AS local_ts,
                     CAST(floor(v * 1e6 + 0.5) AS BIGINT) AS value
              FROM (SELECT * FROM ikept UNION ALL SELECT * FROM idups)
            )
        """,
        "q05_project_query": """
            SELECT r.r_name AS geography,
                   CAST(extract(year FROM o.o_orderdate) AS VARCHAR) AS model_year,
                   round(sum(o.o_totalprice), 2) AS value
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('ASIA', 'AMERICA')
            GROUP BY 1, 2
        """,
        "q38_video_frame_sampling": """
            SELECT 'frame' AS op, doc_id AS media_id,
                   CAST(n_chars % 300 + 1 AS INT) AS n,
                   CAST(unnest(range(0, n_chars % 300 + 1, 30)) AS INT)
                     AS idx,
                   '' AS h
            FROM documents
            UNION ALL
            SELECT 'chunk', media_id, n, idx,
                   substr(md5(substr(text, idx * 450 + 1, 500)), 1, 8)
            FROM (
              SELECT doc_id AS media_id, text, n_chunks AS n,
                     CAST(unnest(range(0, n_chunks)) AS INT) AS idx
              FROM (
                SELECT doc_id, text,
                       CAST(1 + greatest(0, floor(
                         (len(text) - 500 + 449) / 450.0)) AS INT) AS n_chunks
                FROM documents
              )
            )
        """,
        "q08_subset_supplemental": """
            SELECT r.r_name AS region, c.c_mktsegment AS sector,
                   round(sum(c.c_acctbal), 2) AS value
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE c.c_nationkey BETWEEN 0 AND 9
            GROUP BY 1, 2
        """,
        # exact all-pairs jaccard reference for the LSH path: a doc is
        # dropped iff it has a smaller-id neighbor at jaccard >= 0.8
        # (dedup.minhash_dedup semantics; no identical-text groups exist
        # in this corpus so exact-dedup reps = all docs).
        # Pairs come from an inverted index over shingles (see pc CTE)
        # rather than an all-pairs join: exactly equivalent (jaccard > 0
        # needs a shared shingle) and it keeps the reference tractable at
        # the sf1 scale rehearsal, where replica token prefixes
        # (tools/scale_up.py) make cross-replica shingle sets disjoint so
        # replicas never pair at all.
        "q30_minhash_dedup": f"""
            WITH sh AS (
              SELECT doc_id,
                     CASE WHEN len(w) >= 5 THEN
                       list_distinct([array_to_string(w[(i+1):(i+5)], ' ')
                                      for i in range(0, len(w) - 4)])
                     ELSE [array_to_string(w, ' ')] END AS s
              FROM (SELECT doc_id, string_split({_NORM_TEXT}, ' ') AS w
                    FROM documents)
            ), e AS (
              SELECT doc_id, UNNEST(s) AS g FROM sh
            ), sz AS (
              SELECT doc_id, len(s) AS n FROM sh
            ), pc AS (
              -- inverted-index pair generation: a pair appears iff it
              -- shares >= 1 shingle, and jaccard > 0 requires exactly
              -- that, so this is EXACTLY the >= 0.8 candidate set of the
              -- former all-pairs list_intersect join (shingle lists are
              -- already distinct, so COUNT(*) = |intersection|).  Scales
              -- as sum(df^2) over shingles instead of O(n^2) docs — the
              -- sf1 rehearsal's 50k-doc corpus was >90 s all-pairs and
              -- is ~5 s this way, with identical output at every sf.
              SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
              FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), p AS (
              SELECT pc.ia, pc.ib,
                     pc.inter * 1.0 / (sa.n + sb.n - pc.inter) AS jac
              FROM pc JOIN sz sa ON sa.doc_id = pc.ia
                      JOIN sz sb ON sb.doc_id = pc.ib
            )
            SELECT 'full' AS op, doc_id FROM documents d
            WHERE NOT EXISTS (
              SELECT 1 FROM p WHERE p.ib = d.doc_id AND p.jac >= 0.8)
            UNION ALL
            SELECT 'incr', doc_id FROM documents d
            WHERE d.doc_id >= 250 AND NOT EXISTS (
              SELECT 1 FROM p WHERE p.ib = d.doc_id AND p.jac >= 0.8)
            UNION ALL
            -- 'store': the persisted-signature-store reference side is
            -- bit-identical to the DataFrame one, so the expected rows
            -- are the same restricted survivors as 'incr'
            SELECT 'store', doc_id FROM documents d
            WHERE d.doc_id >= 250 AND NOT EXISTS (
              SELECT 1 FROM p WHERE p.ib = d.doc_id AND p.jac >= 0.8)
        """,
        # survivors = the originals: each doc's tokens are unique to it
        # (signatures mutually far) and every normalization-identical
        # copy (id+1e8, hamming 0) must be dropped
        "q31_simhash_dedup": """
            SELECT 'chunk' AS op, doc_id FROM documents
            UNION ALL
            SELECT 'manku' AS op, doc_id FROM documents
        """,
        "q26_external_tz": f"""
            SELECT event_id, CAST(user_id % 2 AS VARCHAR) AS geography,
                   strftime(date_trunc('hour', ts)
                            + to_hours(CASE WHEN user_id % 2 = 0
                                       THEN 6 ELSE 7 END),
                            '{_DUCK_TS}') AS utc_hour,
                   value
            FROM events
        """,
        "q35_period_ending_daily": f"""
            SELECT strftime(date_trunc('day',
                     date_trunc('hour', ts) - to_hours(1)), '{_DUCK_TS}') AS day,
                   CAST(user_id % 4 AS VARCHAR) AS geography,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS value
            FROM events GROUP BY 1, 2
        """,
        "q17_expression_extended": """
            WITH a AS (
              SELECT o_orderpriority,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS v
              FROM orders
              WHERE extract(year FROM o_orderdate) <= 1996 GROUP BY 1
            ), b AS (
              SELECT o_orderpriority,
                     CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS v
              FROM orders
              WHERE extract(year FROM o_orderdate) > 1996 GROUP BY 1
            )
            SELECT o_orderpriority,
                   CAST((CASE WHEN a.v > b.v THEN a.v ELSE b.v END)
                        % 100000 AS BIGINT) AS value
            FROM a JOIN b USING (o_orderpriority)
        """,
        "q39_embedding_centroids": """
            SELECT 'centroid' AS op, CAST(label AS BIGINT) AS gid, i AS pos,
                   CAST(floor(avg(CAST(embedding[i + 1] AS DOUBLE)) * 1e6 + 0.5)
                        AS BIGINT) AS value
            FROM embeddings, (SELECT unnest(range(64)) AS i) idx
            GROUP BY 1, 2, 3
            UNION ALL
            SELECT 'quant' AS op, vec_id AS gid, i AS pos,
                   CAST(round(v[i + 1] / s) AS BIGINT) AS value
            FROM (
              SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
              FROM (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings WHERE vec_id < 10
              )
            ), (SELECT unnest(range(64)) AS i) idx
        """,
        "q11_aggregate_each_dataset": """
            SELECT o_orderpriority, 'early' AS era,
                   CAST(floor(avg(o_totalprice)) AS BIGINT) AS value
            FROM orders WHERE extract(year FROM o_orderdate) <= 1996 GROUP BY 1
            UNION ALL
            SELECT o_orderpriority, 'late' AS era,
                   CAST(floor(avg(o_totalprice)) AS BIGINT) AS value
            FROM orders WHERE extract(year FROM o_orderdate) > 1996 GROUP BY 1
        """,
        "q13_composite_dataset": """
            SELECT o_orderstatus,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS BIGINT) AS value_cents
            FROM orders GROUP BY 1
        """,
        "q16_dataset_query_chain": """
            SELECT CASE WHEN r.r_name IN ('AFRICA', 'ASIA', 'MIDDLE EAST')
                        THEN 'east' ELSE 'west' END AS geography,
                   round(sum(c.c_acctbal), 2) AS value
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        # independent md5 recomputation of the deterministic fake decode
        "q34_multimodal_features": """
            SELECT doc_id AS media_id,
                   CAST(64 + h % 512 AS INT) AS width,
                   CAST(64 + (h >> 9) % 512 AS INT) AS height
            FROM (SELECT doc_id,
                         CAST(concat('0x', substr(md5(text), 1, 16)) AS UBIGINT) AS h
                  FROM documents)
        """,
    }
