"""Link-graph operators: PageRank for domain/page authority scoring.

Web-scale training pipelines weight documents by the authority of their
source (Common-Crawl-style link graphs); PageRank is the standard
signal. The graph here is an (src, dst) edge DataFrame — billions of
edges at 100 TB — so every iteration stays distributed:

- out-degrees: one groupBy over edges, joined back broadcast-or-sortmerge
  by Catalyst/AQE;
- one iteration = contributions (edge join on src) -> groupBy(dst) sum
  -> damping + dangling redistribution;
- lineage is truncated per iteration with ``localCheckpoint`` (the
  library's iterative-algorithm convention, see bpe/connected_components)
  so iteration k's plan stays O(1) deep.

Dangling nodes (no out-edges) redistribute their mass uniformly — the
textbook formulation, so results match reference implementations.

``micro=True`` runs the same recurrence in integer micro-units with
floor division (contribution = rank_micro * damping_ppm // (1e6 *
out_degree)) — deterministic across engines/layouts/summation orders,
the library's cross-engine audit convention. The float default matches
NetworkX-style power iteration (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, iterations: int = 10, damping: float = 0.85,
             src: str = "src", dst: str = "dst",
             micro: bool = False) -> DataFrame:
    """Power-iteration PageRank over an edge list; returns
    (node, rank) summing to ~1 (float mode) or micro-units summing to
    ~1e6 (micro mode). Nodes = union of srcs and dsts.
    """
    if iterations <= 0:
        raise ValueError(f"iterations must be positive, got {iterations}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn(
            "rank", F.lit(0).cast("long" if micro else "double"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))
    # nodes with out-degree keep their edges; dangling mass redistributes
    if micro:
        d_ppm = int(round(damping * 1_000_000))
        init = 1_000_000 // n
        rank_type = "long"
    else:
        rank_type = "double"
    ranks = nodes.withColumn(
        "rank",
        (F.lit(init) if micro else F.lit(1.0 / n)).cast(rank_type),
    ).localCheckpoint(eager=True)
    try:
        for _ in range(iterations):
            # persisted: both the dangling-mass agg and the flow join
            # read it, and without the pin the rank⋈degree join would
            # run twice per iteration
            with_deg = ranks.join(
                deg, ranks["node"] == deg["src"], "left"
            ).select("node", "rank", "out_degree").persist()
            linked = with_deg.filter(F.col("out_degree").isNotNull())
            dangling = with_deg.filter(F.col("out_degree").isNull())
            if micro:
                contrib_expr = (
                    F.col("rank") * F.lit(d_ppm)
                    / (F.lit(1_000_000) * F.col("out_degree"))
                )
                contrib = F.floor(contrib_expr).cast("long")
                dangle_mass = (
                    dangling.agg(F.coalesce(
                        F.sum("rank"), F.lit(0)).alias("m")).collect()[0]["m"])
                base_share = ((1_000_000 - d_ppm) * 1_000_000 // n
                              + d_ppm * int(dangle_mass) // n
                              ) // 1_000_000
            else:
                contrib = (
                    F.col("rank") * F.lit(damping) / F.col("out_degree"))
                dangle_mass = (
                    dangling.agg(F.coalesce(
                        F.sum("rank"), F.lit(0.0)).alias("m"))
                    .collect()[0]["m"])
                base_share = (1.0 - damping) / n + damping * dangle_mass / n
            flows = (
                e.join(linked.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), contrib.alias("c"))
            )
            new_ranks = (
                nodes.join(
                    flows.groupBy("node").agg(F.sum("c").alias("s")),
                    "node", "left")
                .select(
                    "node",
                    (F.coalesce(F.col("s"),
                                F.lit(0).cast(rank_type))
                     + F.lit(base_share)).cast(rank_type).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            with_deg.unpersist()
            ranks.unpersist()
            ranks = new_ranks
    finally:
        nodes.unpersist()
    return ranks
