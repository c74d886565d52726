"""PageRank skew rehearsal: power-law graph at 10M edges (VERDICT r6
item 7 — prior scale evidence was a star graph; real link graphs are
Zipf in BOTH degrees).

Graph: 10M edges over ~1M nodes, src and dst drawn log-uniformly
(P(node i) ~ 1/i — the inverse-CDF of a Zipf(1) degree law), fully
deterministic from the edge id via xxhash64. That concentrates ~7% of
all edges on the single hottest node on each side:

- hot dst stresses the per-iteration groupBy(dst) contribution sum —
  absorbed by map-side partial aggregation (hash aggregate), so the
  shuffle carries at most (#partitions) rows per hot key;
- hot src stresses the edges-join-ranks shuffle — AQE's skew-join
  split handles the sort-merge case.

Asserts the PageRank invariants at scale (mass conservation, hubs
rank top) and prints per-iteration wall + skew stats for SCALE_R7.md.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_pagerank_skew.py
"""
import json
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.graph import pagerank

N_EDGES = 10_000_000
N_NODES = 1_000_000
ITERATIONS = 10


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-pagerank-skew")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # log-uniform node draw: floor(exp(u * ln N)) gives P(i) ~ 1/i
    def zipf_node(seed_col):
        u = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed_col)),
                    F.lit(1 << 40)) / float(1 << 40))
        return F.floor(F.exp(u * F.lit(__import__("math").log(N_NODES)))) \
                .cast("long")

    edges = (spark.range(N_EDGES)
             .select(zipf_node("s").alias("src"),
                     zipf_node("d").alias("dst"))
             .filter(F.col("src") != F.col("dst"))
             .localCheckpoint())

    stats = edges.agg(
        F.count(F.lit(1)).alias("edges"),
        F.countDistinct("src").alias("src_nodes"),
        F.countDistinct("dst").alias("dst_nodes")).first()
    top_out = (edges.groupBy("src").count()
               .orderBy(F.desc("count")).limit(1).first())
    top_in = (edges.groupBy("dst").count()
              .orderBy(F.desc("count")).limit(1).first())

    t0 = time.time()
    ranks = pagerank(edges, iterations=ITERATIONS).persist()
    n_ranked = ranks.count()
    wall = time.time() - t0

    mass = ranks.agg(F.sum("rank")).first()[0]
    top = [(int(r["node"]), float(r["rank"]))
           for r in ranks.orderBy(F.desc("rank")).limit(5).collect()]
    # the hottest in-degree node must be the authority
    assert top[0][0] == int(top_in["dst"]), (top[0], top_in)
    assert abs(mass - 1.0) < 1e-6, mass

    print(json.dumps({
        "edges": int(stats["edges"]),
        "nodes_ranked": n_ranked,
        "max_out_degree": int(top_out["count"]),
        "max_in_degree": int(top_in["count"]),
        "iterations": ITERATIONS,
        "total_sec": round(wall, 1),
        "sec_per_iteration": round(wall / ITERATIONS, 2),
        "rank_mass": mass,
        "top5": top,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
